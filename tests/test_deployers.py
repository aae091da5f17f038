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
    remote; vendor platforms still raise (validation stubs)."""
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
    with pytest.raises(NotImplementedError):
        run_deploy(site, {"platform": "netlify", "extra": {}}, "proj")
    # slug expansion (no network hit: ls-remote fails fast on a
    # nonexistent https remote, surfacing as the git RuntimeError)
    with pytest.raises(RuntimeError, match="git"):
        run_deploy(site, {"platform": "github",
                          "extra": {"repo": "owner/repo"}}, "proj")
