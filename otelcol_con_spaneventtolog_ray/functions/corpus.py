"""Corpus cleaning: the composed training-data keep-set.

``corpus_clean_keep`` = documents that (a) clear the quality threshold,
(b) are their exact-duplicate group's survivor (min doc_id), and (c) are
their near-dup cluster's survivor — the canonical "clean the crawl" recipe
composed entirely from this repo's operators.

Composition shape (Ray Data has no join; the anti-join is a flag-union
groupby): every component emits tiny (doc_id, flag) rows — quality keeps,
exact-dup drops, near-dup drops — and one ``groupby(doc_id).map_groups``
decides membership. Only flags cross the exchange, never documents, and
each component keeps its own scale shape (two-phase exact dedup, bucketed
MinHash verify + connected components).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# module (not name) imports: corpus can be imported while dedup/textstats
# are still initializing (entry_queries registers every module, so a worker
# unpickling a dedup function re-enters this module mid-import of dedup);
# attribute access at CALL time always sees the finished modules
from . import dedup as _dedup
from . import textstats as _textstats
from .entry_queries import register
from ..rayenv import remote_kwargs

FLAG_QUALITY = "q"       # document clears the quality gate
FLAG_EXACT_DROP = "x"    # exact duplicate of a lower doc_id
FLAG_NEAR_DROP = "n"     # near-dup cluster member that is not the survivor


def _quality_flags(sf_dir: str):
    def keep(batch: pa.Table) -> pa.Table:
        stats = _textstats.text_stats_batch(batch)
        import pyarrow.compute as pc

        kept = stats.filter(
            pc.greater_equal(stats.column("quality"), _textstats.QUALITY_THRESHOLD)
        )
        n = kept.num_rows
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "flag": pa.array([FLAG_QUALITY] * n, pa.string()),
            }
        )

    return _dedup._docs(sf_dir).map_batches(keep, batch_format="pyarrow", **remote_kwargs())


def _exact_drop_flags(sf_dir: str):
    """Non-survivors of each exact-duplicate group (groupby(hash), emit every
    id except the min) — only (hash, id) partials ever shuffle."""

    def drops(group: pa.Table) -> pa.Table:
        ids = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": pa.array(ids[1:], pa.int64()),
                "flag": pa.array([FLAG_EXACT_DROP] * (len(ids) - 1), pa.string()),
            }
        )

    hashed = _dedup._docs(sf_dir).map_batches(
        _dedup.exact_hash_batch, batch_format="pyarrow", **remote_kwargs()
    )
    return hashed.groupby("h").map_groups(
        drops, batch_format="pyarrow", **remote_kwargs()
    )


def q_corpus_clean_keep(sf_dir: str):
    """Kept doc_ids after the full cleaning recipe (rows-only: the near-dup
    component is not SQL-expressible; composition pinned against the
    component queries in pytest)."""
    import ray.data

    near = _dedup.q_minhash_dedup_keep(sf_dir)  # small: only docs in near-dup pairs
    near_drops = near.filter(
        pa.compute.equal(near.column("keep"), False)
    ).select(["doc_id"])
    near_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": near_drops.column("doc_id"),
                "flag": pa.array(
                    [FLAG_NEAR_DROP] * near_drops.num_rows, pa.string()
                ),
            }
        )
    )
    flags = _quality_flags(sf_dir).union(_exact_drop_flags(sf_dir)).union(near_ds)

    def decide(group: pa.Table) -> pa.Table:
        fl = set(group.column("flag").to_pylist())
        if FLAG_QUALITY in fl and FLAG_EXACT_DROP not in fl and FLAG_NEAR_DROP not in fl:
            return pa.table(
                {"doc_id": pa.array([group.column("doc_id")[0].as_py()], pa.int64())}
            )
        return pa.table({"doc_id": pa.array([], pa.int64())})

    kept = flags.groupby("doc_id").map_groups(
        decide, batch_format="pyarrow", **remote_kwargs()
    )
    df = kept.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


register("corpus_clean_keep", q_corpus_clean_keep)  # rows-only
