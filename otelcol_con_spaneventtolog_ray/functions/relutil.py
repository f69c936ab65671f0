"""Leaf helpers shared by the relational query tranches.

This module must stay import-leaf (no entry_queries / sibling-module
imports): worker-side closure deserialization imports the defining module
directly, and any edge back into entry_queries' registration import list
recreates the circular partial-init crash documented in entry_queries.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _read(sf_dir: str, table: str, columns):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=list(columns)
    )


def _lookup_int(sorted_keys, sorted_vals, probe, default=-1):
    """Vectorized sorted-array lookup: probe→val, ``default`` on miss."""
    if len(sorted_keys) == 0:
        return np.full(len(probe), default, dtype=np.int64)
    pos = np.minimum(
        np.searchsorted(sorted_keys, probe), len(sorted_keys) - 1
    )
    out = sorted_vals[pos].astype(np.int64, copy=True)
    out[sorted_keys[pos] != probe] = default
    return out


def _q3_join_sentinels(num_partitions: int) -> list[int]:
    """Negative orderkeys covering every hash partition.

    Ray 2.49's join finalize crashes when a hash partition receives no rows
    on either side (the empty partition builds a SCHEMA-LESS table and the
    Arrow join can't find the key column). Ray routes a row to partition
    ``hash((key_scalar,)) % P`` where ``key_scalar`` is a pyarrow Int64Scalar
    — deterministic across processes for integers — so we can compute, on
    the driver, a set of impossible (negative) keys that lands one sentinel
    row in every partition on BOTH sides; the inner join pairs them up and
    the consumer folds drop everything below key 0."""
    keys: list[int] = []
    covered: set[int] = set()
    k = -1
    while len(covered) < num_partitions:
        pid = hash((pa.scalar(k, pa.int64()),)) % num_partitions
        if pid not in covered:
            covered.add(pid)
            keys.append(k)
        k -= 1
    return keys
