"""Worker-import helper.

The library is used from a checkout (not pip-installed), so Ray workers
spawned by the driver won't find the package unless PYTHONPATH reaches them.
Every map_batches stage that ships a function/class defined in this package
passes ``remote_kwargs()`` so workers start with the repo on sys.path, no
matter how the calling session initialized Ray.
"""

from __future__ import annotations

import os

PKG_PARENT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def remote_kwargs() -> dict:
    existing = os.environ.get("PYTHONPATH", "")
    if PKG_PARENT in existing.split(":"):
        # workers inherit the driver env in local mode — no dedicated
        # runtime-env worker pool needed (avoids a cold second pool)
        return {}
    parts = [PKG_PARENT] + ([existing] if existing else [])
    return {"runtime_env": {"env_vars": {"PYTHONPATH": ":".join(parts)}}}
