"""Registry of training-data-pipeline queries exposed via __ray_entry__.

Each entry pairs a Ray Data callable (sf_dir -> Dataset/Table) with, where
SQL-expressible, a DuckDB oracle over the driver's pre-registered views.
Populated by the dedup / text-analysis / similarity modules.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, fn: Callable[[str], Any], sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


# registration side effects (safe partial-import: register is defined above)
from . import (  # noqa: E402,F401
    bpe,
    corpus,
    decontam,
    dedup,
    eventops,
    lines,
    multimodal,
    quantiles,
    relational,
    similarity,
    sketch,
    textstats,
)
