"""Worker-import helper.

The library is used from a checkout (not pip-installed), so Ray workers
spawned by the driver won't find the package unless PYTHONPATH reaches them.
Every map_batches stage that ships a function/class defined in this package
passes ``remote_kwargs()`` so workers start with the repo on sys.path.

Fast path: when the driver's own PYTHONPATH already contains the repo AND
the session is a locally-started one (workers fork from the driver env),
no runtime_env is attached — attaching one forces Ray to spin up a separate
dedicated worker pool even when the env is identical. For a PRE-EXISTING or
multi-node cluster (connected via address/`ray start`), whose raylets never
saw the driver's env, the runtime_env is always attached; on real clusters
prefer `ray job submit --working-dir` (README), which ships the code itself.
"""

from __future__ import annotations

import os

PKG_PARENT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _workers_inherit_driver_env() -> bool:
    """True only for a session this process started in local mode (workers
    fork with the driver's environment)."""
    if os.environ.get("RAY_GRAFT_FORCE_RUNTIME_ENV"):
        return False
    try:
        import ray

        if not ray.is_initialized():
            return True  # auto-init later in this process -> local
        # gcs on this host and started by this process family -> local mode
        addr = ray.get_runtime_context().gcs_address or ""
        return addr.split(":")[0] in ("127.0.0.1", "localhost", _local_ip())
    except Exception:
        return False


def _local_ip() -> str:
    try:
        import ray.util

        return ray.util.get_node_ip_address()
    except Exception:
        return ""


def remote_kwargs() -> dict:
    existing = os.environ.get("PYTHONPATH", "")
    if PKG_PARENT in existing.split(":") and _workers_inherit_driver_env():
        return {}
    parts = [PKG_PARENT] + ([existing] if existing else [])
    return {"runtime_env": {"env_vars": {"PYTHONPATH": ":".join(parts)}}}
