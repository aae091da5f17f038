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

The remaining four HTTP-API deployers stay validation-only stubs (their
transport is a vendor REST API, not reproducible offline).
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
    ssh_cmd = f"ssh -p {port}"
    if key_path:
        ssh_cmd += f" -i {key_path}"
    argv = ["rsync", "-avz", "--delete", "-e", ssh_cmd,
            site_dir.rstrip("/") + "/", f"{host}:{path.rstrip('/')}/"]
    rc, out, err = runner(argv)
    if rc != 0:
        raise RuntimeError(
            f"rsync exited {rc}: {err.strip().splitlines()[-1:] or out}")
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
    - cloudflare/netlify/vercel/render: raise NotImplementedError
      (vendor REST APIs, validation-only stubs).
    """
    platform = spec.get("platform")
    extra = spec.get("extra", {}) or {}
    if platform == "github":
        repo = extra.get("repo", "")
        remote = repo if "://" in repo or repo.startswith("git@") \
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

    return get_plugin(platform, PluginType.DEPLOYER)(site_dir, **extra)


def _network_stub(name: str):
    @register(name, PluginType.DEPLOYER)
    def deploy(*args, **kwargs):
        raise NotImplementedError(
            f"{name} deployment requires the vendor's REST API; the plugin "
            "contract is registered for config validation only")

    deploy.__name__ = f"deploy_{name}"
    return deploy


for _name in ("cloudflare", "netlify", "vercel", "render"):
    _network_stub(_name)
