"""Salted two-phase groupby-aggregate (SURVEY.md §2 op H + north_star mandate).

Per-sink (and arbitrary-key) counts computed as: phase A — partial counts
inside ``map_batches`` (the combiner; this is what makes hot keys like
'exception'/'info' harmless, since each task emits at most |keys| x |salts|
tiny rows instead of shuffling full records); phase B — a small
``groupby().sum()`` over the partials. The salt column keeps phase-B groups
balanced even when one key dominates, at the cost of a second fold that is
O(keys x salts).

The full-row shuffle never happens: only partial count rows cross the
exchange. At 100 TB this is the difference between a ~100 TB all-to-all and
a few MB one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def partial_counts_fn(keys: list[str], num_salts: int = 8):
    """map_batches fn: batch -> tiny (key..., _salt, n) partial-count table."""

    def _partial(batch: pa.Table) -> pa.Table:
        # deterministic salt from row position within the batch: spreads one
        # hot key's partials over num_salts phase-B groups. Works for 0-row
        # batches too (group_by preserves the key column types, so empty
        # blocks can't poison the phase-B schema for non-string keys).
        t = batch.select(keys).append_column(
            "_salt",
            pa.array((np.arange(batch.num_rows) % num_salts).astype(np.int32)),
        )
        out = t.group_by(keys + ["_salt"]).aggregate([([], "count_all")])
        return out.rename_columns(keys + ["_salt", "n"])

    return _partial


def counts_by(
    ds: "ray.data.Dataset", keys: list[str], num_salts: int = 8
) -> "ray.data.Dataset":
    """Two-phase distributed count-by-keys. Returns a Dataset of (keys..., n)."""
    partial = ds.map_batches(
        partial_counts_fn(keys, num_salts), batch_format="pyarrow"
    )
    # phase B: hot keys spread over num_salts reduce groups ...
    salted = partial.groupby(keys + ["_salt"]).sum("n")
    # ... then a tiny fold over |keys| x |salts| rows removes the salt
    final = salted.groupby(keys).sum("sum(n)")
    return final.map_batches(
        lambda t: t.rename_columns(keys + ["n"]), batch_format="pyarrow"
    )


def counts_table(ds: "ray.data.Dataset", keys: list[str], num_salts: int = 8) -> pa.Table:
    """Materialize counts (small result) sorted by keys for stable comparison.

    An empty input yields a TYPED empty table (key types from the input
    dataset's schema, ``n`` int64) — Ray's aggregate drops the schema with
    zero groups, which would otherwise poison every downstream column
    lookup."""
    tbl = pa.Table.from_pandas(
        counts_by(ds, keys, num_salts).to_pandas(), preserve_index=False
    )
    if tbl.num_rows == 0:
        sch = ds.schema()
        if sch is None or any(k not in sch.names for k in keys):
            # zero blocks flowed: Ray cannot infer the transform's schema.
            # Return the schema-less empty; callers that know their key
            # types build a typed one (e.g. dedup.q_minhash_buckets).
            return tbl
        type_of = dict(zip(sch.names, sch.types))
        fields = [(k, type_of[k]) for k in keys] + [("n", pa.int64())]
        return pa.schema(fields).empty_table()
    return tbl.sort_by([(k, "ascending") for k in keys])
