"""github/ssh deployer bodies behind the dry-run transport seam
(VERDICT r8 next-#5): the full git staging-branch flow runs against a
local ``file://`` bare remote; the rsync argv contract runs against an
injected recording runner.  No network, no rsync binary needed."""

import os
import subprocess

import pytest

from niamoto_spark.deployers import deploy_github, deploy_ssh


def _bare_repo(tmp_path):
    bare = tmp_path / "remote.git"
    subprocess.run(["git", "init", "-q", "--bare", str(bare)], check=True)
    return f"file://{bare}"


def _site(tmp_path, content="v1"):
    site = tmp_path / "site"
    (site / "assets").mkdir(parents=True, exist_ok=True)
    (site / "index.html").write_text(f"<html>{content}</html>")
    (site / "assets" / "data.json").write_text('{"a": 1}')
    return str(site)


def _remote_files(remote_url, branch):
    bare = remote_url[len("file://"):]
    out = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", branch],
        cwd=bare, capture_output=True, text=True)
    return set(out.stdout.split())


def test_github_deploy_creates_branch_and_pushes(tmp_path):
    remote = _bare_repo(tmp_path)
    site = _site(tmp_path)
    r = deploy_github(site, remote, project_name="demo")
    assert r["pushed"] is True and r["files"] == 2
    assert _remote_files(remote, "gh-pages") == \
        {"index.html", "assets/data.json", ".nojekyll"}


def test_github_redeploy_replaces_and_detects_no_change(tmp_path):
    remote = _bare_repo(tmp_path)
    site = _site(tmp_path)
    deploy_github(site, remote)
    # unchanged site -> no new commit
    r2 = deploy_github(site, remote)
    assert r2["pushed"] is False
    # changed site -> new commit, stale file REMOVED (worktree replace)
    os.remove(os.path.join(site, "assets", "data.json"))
    (os.path.join(site, "new.html"))
    with open(os.path.join(site, "new.html"), "w") as f:
        f.write("x")
    r3 = deploy_github(site, remote)
    assert r3["pushed"] is True and r3["commit"] != r2["commit"]
    assert _remote_files(remote, "gh-pages") == \
        {"index.html", "new.html", ".nojekyll"}


def test_github_refuses_protected_branch(tmp_path):
    remote = _bare_repo(tmp_path)
    site = _site(tmp_path)
    with pytest.raises(ValueError, match="protected"):
        deploy_github(site, remote, branch="main")
    # explicit override allowed (reference's allow_default_pages lane)
    r = deploy_github(site, remote, branch="main", allow_protected=True)
    assert r["pushed"] is True


def test_ssh_argv_contract_and_errors(tmp_path):
    site = _site(tmp_path)
    calls = []

    def runner(argv):
        calls.append(argv)
        return 0, "f1\nf2\n", ""

    r = deploy_ssh(site, "user@host", "/var/www/site", port=2222,
                   key_path="/k/id_ed25519", runner=runner)
    argv = calls[0]
    assert argv[:4] == ["rsync", "-avz", "--delete", "-e"]
    assert argv[4] == "ssh -p 2222 -i /k/id_ed25519"
    assert argv[5].endswith("/")            # contents, not the dir
    assert argv[6] == "user@host:/var/www/site/"
    assert r["lines"] == 2

    with pytest.raises(RuntimeError, match="exited 23"):
        deploy_ssh(site, "h", "/p",
                   runner=lambda a: (23, "", "rsync: link_stat failed"))
    with pytest.raises(ValueError):
        deploy_ssh(site, "", "/p", runner=runner)


def test_run_deploy_dispatch(tmp_path):
    """Config-block dispatch: owner/repo slug expands to the https
    remote; local paths and URLs pass through untouched."""
    from niamoto_spark.deployers import run_deploy
    from niamoto_spark.registry import load_all

    load_all()
    site = _site(tmp_path)
    remote = _bare_repo(tmp_path)
    r = run_deploy(site, {"platform": "github",
                          "extra": {"repo": remote}}, "proj")
    assert r["pushed"] is True
    r2 = run_deploy(site, {"platform": "local_copy",
                           "extra": {"target_dir": str(tmp_path / "t")}},
                    "proj")
    assert r2["files"] == 2
    # vendor platforms are REAL implementations now; incomplete config
    # surfaces as a clear error instead of a network attempt
    with pytest.raises(ValueError, match="incomplete extra config"):
        run_deploy(site, {"platform": "netlify", "extra": {}}, "proj")
    # slug expansion (no network hit: ls-remote fails fast on a
    # nonexistent https remote, surfacing as the git RuntimeError)
    with pytest.raises(RuntimeError, match="git"):
        run_deploy(site, {"platform": "github",
                          "extra": {"repo": "owner/repo"}}, "proj")


# --- vendor REST deployers (recording fake transports) ---------------------

class _FakeTransport:
    def __init__(self, responses):
        self.calls = []
        self.responses = list(responses)

    def __call__(self, method, url, headers, body):
        self.calls.append((method, url, dict(headers), body))
        return self.responses.pop(0)


def test_netlify_zip_upload_and_poll(tmp_path):
    import io
    import zipfile

    site = _site(tmp_path)
    t = _FakeTransport([
        (200, {"id": "dep1", "state": "uploading"}),
        (200, {"id": "dep1", "state": "processing"}),
        (200, {"id": "dep1", "state": "ready",
               "ssl_url": "https://demo.netlify.app"}),
    ])
    from niamoto_spark.deployers import deploy_netlify

    r = deploy_netlify(site, "site123", "tok", transport=t,
                       sleeper=lambda s: None)
    assert r["url"] == "https://demo.netlify.app"
    m, url, h, body = t.calls[0]
    assert (m, url) == ("POST",
                        "https://api.netlify.com/api/v1/sites/site123/deploys")
    assert h["Content-Type"] == "application/zip"
    assert h["Authorization"] == "Bearer tok"
    names = set(zipfile.ZipFile(io.BytesIO(body)).namelist())
    assert names == {"index.html", "assets/data.json"}
    assert t.calls[1][1].endswith("/api/v1/deploys/dep1")


def test_netlify_error_state_raises(tmp_path):
    from niamoto_spark.deployers import deploy_netlify

    site = _site(tmp_path)
    t = _FakeTransport([
        (200, {"id": "d", "state": "uploading"}),
        (200, {"id": "d", "state": "error", "error_message": "boom"}),
    ])
    with pytest.raises(RuntimeError, match="boom"):
        deploy_netlify(site, "s", "t", transport=t, sleeper=lambda s: None)


def test_cloudflare_session_buckets_and_base64_upload(tmp_path):
    import base64
    import hashlib
    import json

    from niamoto_spark.deployers import deploy_cloudflare

    site = _site(tmp_path)
    idx = open(os.path.join(site, "index.html"), "rb").read()
    h_idx = hashlib.sha256(idx).hexdigest()[:32]
    t = _FakeTransport([
        (200, {"success": True,
               "result": {"jwt": "J1", "buckets": [[h_idx]]}}),
        (200, {"result": {"jwt": "J2"}}),
    ])
    r = deploy_cloudflare(site, "acc", "script", "tok", transport=t)
    assert r == {"files": 2, "uploaded": 1, "completion_jwt": "J2"}
    m, url, h, body = t.calls[0]
    assert url.endswith("/accounts/acc/workers/scripts/script/"
                        "assets-upload-session")
    manifest = json.loads(body)["manifest"]
    assert manifest["/index.html"] == {"hash": h_idx, "size": len(idx)}
    m2, url2, h2, body2 = t.calls[1]
    assert url2.endswith("/workers/assets/upload?base64=true")
    assert h2["Authorization"] == "Bearer J1"        # session JWT
    assert json.loads(body2)["files"][h_idx] == \
        base64.b64encode(idx).decode()


def test_vercel_digest_uploads_then_deployment(tmp_path):
    import hashlib
    import json

    from niamoto_spark.deployers import deploy_vercel

    site = _site(tmp_path)
    t = _FakeTransport([
        (200, {}), (200, {}),
        (200, {"id": "dep", "url": "demo.vercel.app"}),
    ])
    r = deploy_vercel(site, "proj", "tok", transport=t)
    assert r["url"] == "demo.vercel.app" and r["files"] == 2
    # first two calls: per-file digest uploads
    for (m, url, h, body) in t.calls[:2]:
        assert (m, url) == ("POST", "https://api.vercel.com/v2/files")
        assert h["x-vercel-digest"] == hashlib.sha1(body).hexdigest()
    m, url, h, body = t.calls[2]
    assert url.endswith("/v13/deployments")
    payload = json.loads(body)
    assert payload["name"] == "proj"
    assert {f["file"] for f in payload["files"]} == \
        {"index.html", os.path.join("assets", "data.json")}


def test_render_hook_and_api_paths(tmp_path):
    from niamoto_spark.deployers import deploy_render

    site = _site(tmp_path)
    t = _FakeTransport([(200, {})])
    r = deploy_render(site, deploy_hook_url="https://hook/x", transport=t)
    assert r == {"via": "hook", "status": 200}
    assert t.calls[0][:2] == ("POST", "https://hook/x")

    t2 = _FakeTransport([(201, {"id": "d9"})])
    r2 = deploy_render(site, service_id="srv", token="tok", transport=t2)
    assert r2["via"] == "api" and r2["deploy_id"] == "d9"
    assert t2.calls[0][1].endswith("/v1/services/srv/deploys")
    with pytest.raises(ValueError):
        deploy_render(site)
