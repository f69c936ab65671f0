"""Shared guard for a Ray 2.49 shuffle quirk: EMPTY partitions emerge from
groupby aggregates as SCHEMA-LESS zero-row blocks. Any stage that consumes
aggregate output by column name (a rename, a hash join's key lookup) must
retype those blocks or it crashes on the first sparse shuffle. One helper so
the workaround is greppable in one place (previously copy-pasted per query).
"""

from __future__ import annotations

import pyarrow as pa


def retype_block(t: pa.Table, fields: dict[str, tuple[str, pa.DataType]]) -> pa.Table:
    """Select/rename aggregate output columns, passing schema-less empty
    blocks through TYPED.

    ``fields`` maps output column name -> (source column name, arrow type).
    """
    if t.num_rows == 0 or any(
        src not in t.column_names for src, _ in fields.values()
    ):
        return pa.table(
            {name: pa.array([], typ) for name, (_, typ) in fields.items()}
        )
    return pa.table({name: t.column(src) for name, (src, _) in fields.items()})
