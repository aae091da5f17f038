"""Deployers — publish the static export (reference:
src/niamoto/core/plugins/deployers/*, base contract base.py:326-434).

Network deployers (github/cloudflare/netlify/vercel/render/ssh) are
driver-side HTTP and out of engine scope (SURVEY §2.1); the plugin CONTRACT
is kept so configs validate, with a working ``local_copy`` deployer and
explicit NotImplementedError for network targets in this offline
environment."""

from __future__ import annotations

import os
import shutil

from niamoto_spark.registry import PluginType, register


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


def _network_stub(name: str):
    @register(name, PluginType.DEPLOYER)
    def deploy(*args, **kwargs):
        raise NotImplementedError(
            f"{name} deployment requires network access; the plugin contract "
            "is registered for config validation only")

    deploy.__name__ = f"deploy_{name}"
    return deploy


for _name in ("github", "cloudflare", "netlify", "vercel", "render", "ssh"):
    _network_stub(_name)
