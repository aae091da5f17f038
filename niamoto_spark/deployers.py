"""Deployers — publish the static export (reference:
src/niamoto/core/plugins/deployers/*, base contract base.py:326-434).

The reference ships six network deployers; SURVEY §2.1 scopes the
HTTP-API ones (cloudflare/netlify/vercel/render) out of the engine, but
``github`` and ``ssh`` have real local semantics worth parity
(reference github.py:129-257 staging-branch git flow, ssh.py:56-75
rsync contract), so they are implemented here with the NETWORK call
isolated behind one injectable seam:

- ``deploy_github`` speaks plain git to any remote URL — a
  ``file:///...`` bare repo exercises the entire flow (branch fetch or
  orphan creation, worktree replacement, no-change detection, commit,
  push) with zero network; a real GitHub remote is just a different
  URL + credential helper.
- ``deploy_ssh`` builds the reference's exact rsync argv and hands it
  to an injectable ``runner`` (default: subprocess). Tests inject a
  recording runner; production uses the default against a real host.
- the four vendor-REST deployers (netlify/cloudflare/vercel/render)
  follow the reference request sequences with all HTTP behind one
  injectable ``transport`` (default: stdlib urllib — REAL network);
  recording-fake tests pin the contracts offline.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

from niamoto_spark.registry import PluginType, register

#: Branches a Pages deploy must never force-replace (reference
#: github.py:27 PROTECTED_DEPLOY_BRANCHES).
PROTECTED_BRANCHES = frozenset({"main", "master", "trunk", "develop", "dev"})
DEFAULT_AUTHOR = ("Niamoto Deploy", "deploy@niamoto.local")


@register("local_copy", PluginType.DEPLOYER)
def deploy_local_copy(site_dir: str, target_dir: str) -> dict:
    """Copy the exported site to a target directory (atomic-ish: staged
    then renamed)."""
    staging = target_dir.rstrip("/") + ".__deploy__"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    shutil.copytree(site_dir, staging)
    if os.path.exists(target_dir):
        shutil.rmtree(target_dir)
    os.rename(staging, target_dir)
    n = sum(len(fs) for _, _, fs in os.walk(target_dir))
    return {"target": target_dir, "files": n}


def _git(args: list[str], cwd: str) -> str:
    r = subprocess.run(["git", *args], cwd=cwd, capture_output=True,
                       text=True)
    if r.returncode != 0:
        raise RuntimeError(
            f"git {' '.join(args)} failed: {r.stderr.strip()[-500:]}")
    return r.stdout


def _clear_worktree(repo_dir: str) -> None:
    """Remove everything except .git — the deploy REPLACES the site
    (reference github.py:587-596), it does not layer onto stale files."""
    for name in os.listdir(repo_dir):
        if name == ".git":
            continue
        p = os.path.join(repo_dir, name)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)


def _copy_site(site_dir: str, repo_dir: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(site_dir):
        rel = os.path.relpath(root, site_dir)
        dst_root = (repo_dir if rel == "." else
                    os.path.join(repo_dir, rel))
        os.makedirs(dst_root, exist_ok=True)
        for f in files:
            shutil.copy2(os.path.join(root, f), os.path.join(dst_root, f))
            n += 1
    return n


@register("github", PluginType.DEPLOYER)
def deploy_github(site_dir: str, remote_url: str,
                  branch: str = "gh-pages",
                  project_name: str = "site",
                  author: tuple[str, str] = DEFAULT_AUTHOR,
                  allow_protected: bool = False) -> dict:
    """GitHub-Pages-style deploy via the git transport (reference
    github.py:129-257): fetch-or-create the deployment branch in a
    throwaway clone, replace the worktree with the exported site, add
    ``.nojekyll``, commit, push.

    ``remote_url`` is the seam: a ``file:///.../bare.git`` remote runs
    the identical flow offline (tests); a ``https://github.com/...``
    remote is the production path (credentials via ambient git config —
    token plumbing is deliberately NOT handled here).

    Returns ``{"branch", "commit", "files", "pushed"}``; a no-change
    redeploy returns ``pushed=False`` with the current commit
    (reference's "already up to date" lane, github.py:221-229).
    """
    branch = branch.strip().strip("/") or "gh-pages"
    if branch in PROTECTED_BRANCHES and not allow_protected:
        raise ValueError(
            f"refusing to deploy to protected branch '{branch}' "
            "(pass allow_protected=True to override)")
    if not os.path.isdir(site_dir):
        raise FileNotFoundError(f"export directory not found: {site_dir}")

    with tempfile.TemporaryDirectory(prefix="niamoto-deploy-") as tmp:
        repo_dir = os.path.join(tmp, "repo")
        os.makedirs(repo_dir)
        _git(["init", "-q"], repo_dir)
        _git(["config", "user.name", author[0]], repo_dir)
        _git(["config", "user.email", author[1]], repo_dir)
        _git(["remote", "add", "origin", remote_url], repo_dir)

        exists = bool(_git(["ls-remote", "--heads", "origin", branch],
                           repo_dir).strip())
        if exists:
            _git(["fetch", "-q", "--depth", "1", "origin", branch],
                 repo_dir)
            _git(["checkout", "-q", "-B", branch, "FETCH_HEAD"], repo_dir)
            _clear_worktree(repo_dir)
        else:
            _git(["checkout", "-q", "--orphan", branch], repo_dir)

        n_files = _copy_site(site_dir, repo_dir)
        # GitHub Pages would otherwise run Jekyll over the tree
        open(os.path.join(repo_dir, ".nojekyll"), "w").close()
        _git(["add", "--all"], repo_dir)

        staged = _git(["diff", "--cached", "--name-only"], repo_dir)
        if exists and not staged.strip():
            sha = _git(["rev-parse", "--short", "HEAD"], repo_dir).strip()
            return {"branch": branch, "commit": sha,
                    "files": n_files, "pushed": False}

        _git(["commit", "-q", "-m", f"Deploy {project_name}"], repo_dir)
        sha = _git(["rev-parse", "--short", "HEAD"], repo_dir).strip()
        _git(["push", "-q", "origin", f"HEAD:refs/heads/{branch}"],
             repo_dir)
        return {"branch": branch, "commit": sha,
                "files": n_files, "pushed": True}


def _default_runner(argv: list[str]) -> tuple[int, str, str]:
    r = subprocess.run(argv, capture_output=True, text=True)
    return r.returncode, r.stdout, r.stderr


@register("ssh", PluginType.DEPLOYER)
def deploy_ssh(site_dir: str, host: str, path: str, port: int = 22,
               key_path: str | None = None,
               runner=_default_runner) -> dict:
    """rsync-over-SSH deploy (reference ssh.py:56-75's exact argv
    contract: ``-avz --delete``, trailing slash on the source so
    CONTENTS sync, ``-e 'ssh -p PORT [-i KEY]'``).

    ``runner`` is the transport seam — it receives the argv and returns
    ``(returncode, stdout, stderr)``.  The default shells out to rsync;
    tests inject a recording runner, so the command construction and
    error handling are covered without a network or rsync binary.
    """
    if not host:
        raise ValueError("deploy_ssh: host is required")
    if not path:
        raise ValueError("deploy_ssh: remote path is required")
    if not os.path.isdir(site_dir):
        raise FileNotFoundError(f"export directory not found: {site_dir}")
    if key_path and any(c.isspace() for c in key_path):
        # rsync tokenizes the -e value on whitespace, so a key path
        # with spaces silently becomes two broken ssh arguments
        raise ValueError(
            f"deploy_ssh: key_path must not contain whitespace "
            f"({key_path!r})")
    ssh_cmd = f"ssh -p {port}"
    if key_path:
        ssh_cmd += f" -i {key_path}"
    argv = ["rsync", "-avz", "--delete", "-e", ssh_cmd,
            site_dir.rstrip("/") + "/", f"{host}:{path.rstrip('/')}/"]
    rc, out, err = runner(argv)
    if rc != 0:
        tail = (err.strip().splitlines() or out.strip().splitlines()
                or [""])[-1]
        raise RuntimeError(f"rsync exited {rc}: {tail}")
    return {"host": host, "path": path, "argv": argv,
            "lines": len(out.splitlines())}


def run_deploy(site_dir: str, spec: dict, project_name: str) -> dict:
    """Dispatch an ``export.yml`` target's ``deploy:`` block (reference
    DeployConfig shape, deployers/models.py:9-17: ``platform``,
    optional ``branch``, platform-specific ``extra``).

    Mapping per platform:
    - ``github``: ``extra.repo`` is either the reference's
      ``owner/repo`` slug (expanded to the https remote like
      github.py:570 _get_git_remote_url) or a full remote URL —
      ``file://`` bare repos run the identical flow offline.
    - ``ssh``: ``extra.{host,path,port,key_path}`` (ssh.py:25-28).
    - ``local_copy``: ``extra.target_dir``.
    - netlify/cloudflare/vercel/render: dispatched with ``extra`` as
      keyword config (site_id/token etc.); these hit the REAL vendor
      APIs via the default urllib transport.
    """
    platform = spec.get("platform")
    extra = spec.get("extra", {}) or {}
    if platform == "github":
        repo = extra.get("repo", "")
        # URLs and EXPLICIT paths pass through; anything else is an
        # owner/repo slug.  No os.path.isdir sniffing: that would make
        # "docs/site" deploy to a local directory or to GitHub
        # depending on the working directory.
        is_url_or_path = ("://" in repo or repo.startswith("git@")
                          or repo.startswith(("/", "./", "../")))
        remote = repo if is_url_or_path \
            else f"https://github.com/{repo}.git"
        return deploy_github(
            site_dir, remote,
            branch=spec.get("branch") or extra.get("branch") or "gh-pages",
            project_name=project_name,
            allow_protected=bool(extra.get("allow_protected", False)))
    if platform == "ssh":
        return deploy_ssh(site_dir, extra.get("host", ""),
                          extra.get("path", ""),
                          port=int(extra.get("port", 22)),
                          key_path=extra.get("key_path"))
    if platform == "local_copy":
        return deploy_local_copy(site_dir, extra["target_dir"])
    from niamoto_spark.registry import get_plugin

    fn = get_plugin(platform, PluginType.DEPLOYER)
    try:
        return fn(site_dir, **extra)
    except TypeError as e:
        raise ValueError(
            f"deploy platform {platform!r}: incomplete extra config "
            f"({e})") from e


# --- vendor REST deployers -------------------------------------------------
#
# Each vendor flow is implemented faithfully to the reference's request
# sequence, with ALL network I/O behind one injectable ``transport``
# callable: transport(method, url, headers, body) -> (status, payload)
# where payload is parsed JSON for JSON responses.  The default
# transport is stdlib urllib (real HTTP); tests inject recording fakes,
# so the request contracts are covered offline.


def _urllib_transport(method: str, url: str, headers: dict,
                      body: bytes | None) -> tuple[int, dict]:
    import json as _json
    import urllib.error
    import urllib.request

    def parse(status, raw):
        try:
            return status, _json.loads(raw or b"{}")
        except ValueError:
            return status, {"raw": raw.decode("utf8", "replace")}

    req = urllib.request.Request(url, data=body, headers=headers,
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return parse(resp.status, resp.read())
    except urllib.error.HTTPError as e:
        # 4xx/5xx must flow back as (status, body) — the deployers'
        # error lanes own the message (r9 self-review: urlopen raises
        # here, which would bypass every status check)
        return parse(e.code, e.read())


def _zip_site(site_dir: str) -> bytes:
    """In-memory ZIP of the export tree (reference netlify.py:169-178)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(site_dir):
            for fname in sorted(files):
                ap = os.path.join(root, fname)
                zf.write(ap, os.path.relpath(ap, site_dir))
    return buf.getvalue()


def _site_files(site_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(site_dir):
        for f in sorted(files):
            out.append(os.path.join(root, f))
    return sorted(out)


@register("netlify", PluginType.DEPLOYER)
def deploy_netlify(site_dir: str, site_id: str, token: str,
                   transport=_urllib_transport, sleeper=None,
                   max_poll: int = 60) -> dict:
    """Netlify ZIP deploy (reference netlify.py:100-165): POST the
    zipped site to ``/api/v1/sites/{site_id}/deploys`` with a Bearer
    token, then poll ``/api/v1/deploys/{id}`` until state
    ready/error."""
    import time as _time

    sleeper = sleeper or _time.sleep
    zip_bytes = _zip_site(site_dir)
    status, d = transport(
        "POST", f"https://api.netlify.com/api/v1/sites/{site_id}/deploys",
        {"Authorization": f"Bearer {token}",
         "Content-Type": "application/zip"}, zip_bytes)
    if status >= 400:
        raise RuntimeError(f"netlify upload failed: HTTP {status}")
    deploy_id = d["id"]
    for _ in range(max_poll):
        status, d = transport(
            "GET", f"https://api.netlify.com/api/v1/deploys/{deploy_id}",
            {"Authorization": f"Bearer {token}"}, None)
        if status >= 400:
            raise RuntimeError(
                f"netlify status poll failed: HTTP {status} {d}")
        state = d.get("state", "")
        if state == "ready":
            return {"deploy_id": deploy_id,
                    "url": d.get("ssl_url") or d.get("url", ""),
                    "zip_bytes": len(zip_bytes)}
        if state == "error":
            raise RuntimeError(
                f"netlify deploy failed: {d.get('error_message')}")
        sleeper(3.0)
    raise RuntimeError("netlify deploy timed out")


@register("cloudflare", PluginType.DEPLOYER)
def deploy_cloudflare(site_dir: str, account_id: str, script_name: str,
                      token: str, transport=_urllib_transport) -> dict:
    """Cloudflare Workers-assets deploy (reference cloudflare.py:
    120-290): manifest of truncated-sha256 file hashes -> upload
    session (returns a JWT + the buckets of hashes the CDN lacks) ->
    base64 bucket uploads -> completion JWT returned for the script
    version attach."""
    import base64
    import hashlib

    base = "https://api.cloudflare.com/client/v4"
    manifest, by_hash = {}, {}
    for ap in _site_files(site_dir):
        rel = "/" + os.path.relpath(ap, site_dir)
        data = open(ap, "rb").read()
        h = hashlib.sha256(data).hexdigest()[:32]  # cloudflare.py:40
        manifest[rel] = {"hash": h, "size": len(data)}
        by_hash[h] = data
    import json as _json

    status, d = transport(
        "POST", f"{base}/accounts/{account_id}/workers/scripts/"
                f"{script_name}/assets-upload-session",
        {"Authorization": f"Bearer {token}",
         "Content-Type": "application/json"},
        _json.dumps({"manifest": manifest}).encode())
    if status >= 400 or not d.get("success", True):
        raise RuntimeError(f"cloudflare session failed: HTTP {status}")
    result = d.get("result", {})
    jwt = result.get("jwt", "")
    buckets = result.get("buckets", [])
    completion = jwt
    uploaded = 0
    for bucket in buckets:
        files = {h: base64.b64encode(by_hash[h]).decode()
                 for h in bucket if h in by_hash}
        missing = [h for h in bucket if h not in by_hash]
        if missing:
            raise RuntimeError(
                f"cloudflare: hashes not in manifest: {missing}")
        status, d = transport(
            "POST", f"{base}/accounts/{account_id}/workers/assets/"
                    f"upload?base64=true",
            {"Authorization": f"Bearer {jwt}",
             "Content-Type": "application/json"},
            _json.dumps({"files": files}).encode())
        if status >= 400 or not d.get("success", True):
            raise RuntimeError(
                f"cloudflare upload failed: HTTP {status} "
                f"{d.get('errors', '')}")
        completion = d.get("result", {}).get("jwt", completion)
        uploaded += len(files)
    return {"files": len(manifest), "uploaded": uploaded,
            "completion_jwt": completion}


@register("vercel", PluginType.DEPLOYER)
def deploy_vercel(site_dir: str, project: str, token: str,
                  transport=_urllib_transport) -> dict:
    """Vercel deploy (reference vercel.py:60-190): upload each file to
    ``/v2/files`` keyed by its sha1 digest, then create the deployment
    with the (file, sha, size) manifest."""
    import hashlib
    import json as _json

    base = "https://api.vercel.com"
    entries = []
    for ap in _site_files(site_dir):
        rel = os.path.relpath(ap, site_dir)
        data = open(ap, "rb").read()
        sha = hashlib.sha1(data).hexdigest()  # vercel.py:89
        entries.append({"file": rel, "sha": sha, "size": len(data),
                        "data": data})
    for e in entries:
        status, _ = transport(
            "POST", f"{base}/v2/files",
            {"Authorization": f"Bearer {token}",
             "Content-Length": str(e["size"]),
             "x-vercel-digest": e["sha"]}, e["data"])
        if status >= 400:
            raise RuntimeError(
                f"vercel file upload failed for {e['file']}: {status}")
    status, d = transport(
        "POST", f"{base}/v13/deployments",
        {"Authorization": f"Bearer {token}",
         "Content-Type": "application/json"},
        _json.dumps({
            "name": project, "target": "production",
            "files": [{"file": e["file"], "sha": e["sha"],
                       "size": e["size"]} for e in entries],
            "projectSettings": {"framework": None},
        }).encode())
    if status >= 400:
        raise RuntimeError(f"vercel deployment create failed: {status}")
    return {"files": len(entries), "url": d.get("url", ""),
            "deployment_id": d.get("id", "")}


@register("render", PluginType.DEPLOYER)
def deploy_render(site_dir: str, deploy_hook_url: str | None = None,
                  service_id: str | None = None, token: str | None = None,
                  transport=_urllib_transport) -> dict:
    """Render deploy (reference render.py:66-135): either trigger the
    no-auth deploy hook, or POST ``/v1/services/{id}/deploys`` with a
    Bearer token.  Render pulls the site from the connected repo, so
    ``site_dir`` is only validated for existence (parity with the
    reference, which deploys the pushed tree)."""
    if not os.path.isdir(site_dir):
        raise FileNotFoundError(f"export directory not found: {site_dir}")
    if deploy_hook_url:
        status, d = transport("POST", deploy_hook_url, {}, None)
        if status >= 400:
            raise RuntimeError(f"render deploy hook failed: HTTP {status}")
        return {"via": "hook", "status": status}
    if not (service_id and token):
        raise ValueError(
            "render needs deploy_hook_url or (service_id, token)")
    status, d = transport(
        "POST", f"https://api.render.com/v1/services/{service_id}/deploys",
        {"Authorization": f"Bearer {token}",
         "Content-Type": "application/json"}, b"{}")
    if status >= 400:
        raise RuntimeError(f"render deploy failed: HTTP {status}")
    return {"via": "api", "deploy_id": d.get("id", ""), "status": status}
