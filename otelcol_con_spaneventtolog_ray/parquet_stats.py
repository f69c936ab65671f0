"""Parquet footer-statistics helpers shared by the pushdown-planning ops.

Reading bounds/row counts from footers is the zero-data-read planning
primitive behind the chunk-pair near-dup scorer, the quantile sketch's bin
range, query/centroid seed reads, and the Jaccard size guard.
"""

from __future__ import annotations

import glob
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq


def _footer_files(path: str) -> list[str]:
    """A single parquet file, or every *.parquet under a directory — the
    shape a web-scale table actually has (one file per written partition)."""
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(glob.escape(path), "**", "*.parquet"),
                      recursive=True)
        )
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
        return files
    return [path]


def column_stats_bounds(path: str, column: str) -> tuple[float, float]:
    """(min, max) of a column from footer statistics — no data read; `path`
    may be one file or a directory of parquet files.

    Row groups whose statistics lack min/max (e.g. all-null groups) are
    skipped; falls back to a single-column scan only when NO row group
    carries usable statistics.
    """
    lo = hi = None
    for f in _footer_files(path):
        pf = pq.ParquetFile(f)
        for rg in range(pf.metadata.num_row_groups):
            meta = pf.metadata.row_group(rg)
            for c in range(meta.num_columns):
                col = meta.column(c)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                s = col.statistics
                if not s.has_min_max or s.min is None or s.max is None:
                    continue  # e.g. an all-null row group
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
    if lo is None:
        vals = pq.read_table(path, columns=[column]).column(column)
        if len(vals) == 0 or vals.null_count == len(vals):
            raise ValueError(f"column {column!r} of {path} has no values")
        lo, hi = pc.min(vals).as_py(), pc.max(vals).as_py()
    return lo, hi


def file_num_rows(path: str) -> int:
    """Total row count from footers — no data read; file or directory."""
    return sum(
        int(pq.ParquetFile(f).metadata.num_rows) for f in _footer_files(path)
    )
