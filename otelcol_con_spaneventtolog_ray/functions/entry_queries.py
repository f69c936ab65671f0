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
#: name -> zero-arg thunk producing the SQL. For mirrors that COMPOSE
#: another module's SQL contract: an eager cross-module constant access
#: deadlocks a worker-side direct import (textstats -> entry_queries ->
#: corpus -> half-initialized textstats), so the composition is deferred
#: to resolve_lazy_oracles(), called only from the driver-facing
#: oracle_sql() when every module is fully imported.
LAZY_ORACLE_SQL: dict[str, Callable[[], str]] = {}


def register(name: str, fn: Callable[[str], Any], sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


def register_lazy_sql(name: str, thunk: Callable[[], str]) -> None:
    LAZY_ORACLE_SQL[name] = thunk


def resolve_lazy_oracles() -> None:
    while LAZY_ORACLE_SQL:
        name, thunk = LAZY_ORACLE_SQL.popitem()
        ORACLE_SQL[name] = thunk()


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
    relational2,
    relational3,
    relational4,
    similarity,
    sketch,
    textstats,
    weburl,
)
