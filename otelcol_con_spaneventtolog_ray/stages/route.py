"""Router / sink fan-out stage (SURVEY.md §2 ops H/I).

The reference groups output rows under (resource, scope) and only emits
non-empty batches (connector.go:156-186, 228-245; CHANGELOG.md:7-11 empty-
batch suppression). Our analog: ``sink`` (severity class) is a plain column
computed in enrich; routing is ``write_parquet(partition_cols=["sink"])`` —
a per-block fan-out with NO shuffle. Empty blocks produce no files, matching
the reference's no-empty-batches behavior.

Sink-partition row counts are recovered from the written files' Parquet
footers (zero data read), so the post-write aggregate costs nothing.
"""

from __future__ import annotations

import os
from collections import defaultdict

import pyarrow.parquet as pq

import ray.data


def write_routed(
    records: "ray.data.Dataset",
    out_dir: str,
    partition_cols: list[str] | None = None,
    min_rows_per_file: int | None = None,
) -> None:
    """Stream records to partitioned Parquet (one dir per sink value)."""
    partition_cols = partition_cols or ["sink"]
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    records.write_parquet(out_dir, partition_cols=partition_cols, **kwargs)


def routed_counts_from_footers(out_dir: str) -> dict[str, int]:
    """Per-sink row counts from parquet metadata of a partitioned output dir."""
    counts: dict[str, int] = defaultdict(int)
    for root, dirs, files in os.walk(out_dir):
        # skip metadata side-channels (_deadletter, _tmp, _manifests)
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        part = None
        for seg in root.split(os.sep):
            if seg.startswith("sink="):
                part = seg[len("sink="):]
        for f in files:
            if not f.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, f)).metadata
            counts[part if part is not None else ""] += meta.num_rows
    return dict(counts)
