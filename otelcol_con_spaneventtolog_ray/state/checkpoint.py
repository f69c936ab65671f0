"""Manifest-driven checkpoint/resume with per-partition lineage + metrics.

North-star requirement (BASELINE.json / SURVEY.md §4): deterministic input
partitioning at file granularity; after each shard's sinks commit, a manifest
row `{shard_id, input_files, pages_in, records_out, counts_by_sink,
duration_sec}` is written ATOMICALLY (tmp + rename). Resume diffs the
manifest dir against the input listing and reprocesses only missing shards;
final counts are re-aggregated from manifests without touching data.

Output layout (resumable, never one giant file):

    out_root/
      shard=0/ sink=error/ *.parquet ...
      shard=1/ ...
      _manifests/ shard-0.json ...

Commit protocol per shard: write to `out_root/_tmp/shard=K`, rename the dir
into place, then write the manifest. A shard is committed iff its manifest
exists, so a crash between rename and manifest write only re-does one shard
(the stale dir is removed on retry).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections import defaultdict
from typing import Any

from ..config import PipelineConfig
from ..pipelines.telemetry import build_log_records, read_pages
from ..stages.route import routed_counts_from_footers, write_routed


def list_input_files(input_dir: str | list[str]) -> list[str]:
    if isinstance(input_dir, list):
        return sorted(input_dir)
    if os.path.isfile(input_dir):
        return [input_dir]
    out = []
    for root, _d, files in os.walk(input_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def plan_shards(files: list[str], shard_size: int) -> list[list[str]]:
    """Deterministic file-granularity sharding (lexicographic order)."""
    return [files[i : i + shard_size] for i in range(0, len(files), shard_size)]


def _footer_rows(files: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _manifest_path(out_root: str, shard_id: int) -> str:
    return os.path.join(out_root, "_manifests", f"shard-{shard_id}.json")


def _write_manifest_atomic(path: str, payload: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.rename(tmp, path)


def committed_shards(out_root: str) -> dict[int, dict[str, Any]]:
    mdir = os.path.join(out_root, "_manifests")
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(mdir):
        return out
    for f in os.listdir(mdir):
        if f.startswith("shard-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            out[int(m["shard_id"])] = m
    return out


def run_resumable(
    input_dir: str | list[str],
    out_root: str,
    cfg: PipelineConfig | None = None,
    *,
    shard_size: int = 16,
    fail_after_shards: int | None = None,
    deadletter: bool = False,
    max_concurrent_shards: int = 1,
    **build_kwargs: Any,
) -> dict[str, Any]:
    """Run the flagship pipeline shard-by-shard with commit manifests.

    Each shard is one streaming Dataset execution over its input files (the
    intra-shard parallelism is Ray Data's); `fail_after_shards` injects a
    crash for the resume test. Returns aggregate metrics from manifests.

    ``deadletter=True`` collects malformed OTEL1 lines from the SAME parse
    pass (single read) into each shard's ``_deadletter/`` subdir; the
    side-band is written under the shard's tmp dir, so it commits atomically
    with the shard's rename and resume semantics need no extra bookkeeping.

    ``max_concurrent_shards > 1`` overlaps that many shard executions from
    driver threads (each thread drives its own streaming Dataset). Shards
    are independent — distinct tmp/final dirs, atomic per-shard manifest —
    so concurrency changes NOTHING about the commit or resume semantics;
    it exists because a single small shard's DAG cannot keep a large
    cluster busy near its boundaries (tail tasks), and the fixed per-shard
    DAG cost dominates at small shard sizes (measured 3.6x on the 17-shard
    bench demo, BASELINE.md). Serial (the default) remains the
    deterministic-order path; the crash-injection test hook requires it
    because "after K commits" is only well-defined serially.
    """
    cfg = cfg or PipelineConfig.default()
    if max_concurrent_shards < 1:
        raise ValueError("max_concurrent_shards must be >= 1")
    if fail_after_shards is not None and max_concurrent_shards != 1:
        raise ValueError(
            "fail_after_shards (the crash-injection test hook) requires "
            "serial execution: 'after K committed shards' is only "
            "well-defined with max_concurrent_shards=1"
        )
    files = list_input_files(input_dir)
    shards = plan_shards(files, shard_size)
    done = committed_shards(out_root)
    stale = set(done) - set(range(len(shards)))
    if stale:
        raise RuntimeError(
            f"manifests exist for shards {sorted(stale)} not in the current "
            "input plan — input listing shrank since last run; use a fresh "
            "out_root (totals would otherwise include orphaned shards)"
        )

    import threading

    # Dataset CONSTRUCTION is serialized across shard threads: Ray Data's
    # read planning triggers lazy imports (fsspec's HTTP filesystem probe)
    # that are not thread-safe under concurrent first-import — observed as
    # a partial-module ImportError at 8-way shard concurrency. Execution
    # (write_routed below) is the heavy part and stays fully parallel.
    plan_lock = threading.Lock()

    def _run_shard(shard_id: int, shard_files: list[str]) -> dict[str, Any]:
        t0 = time.perf_counter()
        final_dir = os.path.join(out_root, f"shard={shard_id}")
        tmp_dir = os.path.join(out_root, "_tmp", f"shard={shard_id}")
        for leftover in (final_dir, tmp_dir):
            if os.path.isdir(leftover):
                shutil.rmtree(leftover)  # uncommitted leftovers from a crash
        # input row count from parquet footers — metadata only, so the shard's
        # data is read exactly ONCE (by the pipeline pass below)
        pages_in = _footer_rows(shard_files)
        shard_kwargs = dict(build_kwargs)
        if deadletter:
            shard_kwargs.setdefault(
                "deadletter_dir", os.path.join(tmp_dir, "_deadletter")
            )
        with plan_lock:
            records = build_log_records(
                read_pages(shard_files), cfg, **shard_kwargs
            )
        os.makedirs(tmp_dir, exist_ok=True)
        write_routed(records, tmp_dir)
        os.makedirs(os.path.dirname(final_dir), exist_ok=True)
        os.rename(tmp_dir, final_dir)
        counts = routed_counts_from_footers(final_dir)
        manifest = {
            "shard_id": shard_id,
            "input_files": shard_files,
            "pages_in": pages_in,
            "records_out": int(sum(counts.values())),
            "counts_by_sink": counts,
            "duration_sec": round(time.perf_counter() - t0, 3),
        }
        _write_manifest_atomic(_manifest_path(out_root, shard_id), manifest)
        return manifest

    pending: list[tuple[int, list[str]]] = []
    for shard_id, shard_files in enumerate(shards):
        if shard_id in done:
            if done[shard_id]["input_files"] != shard_files:
                raise RuntimeError(
                    f"shard {shard_id} manifest input mismatch — input listing "
                    "changed since last run; use a fresh out_root"
                )
            continue
        pending.append((shard_id, shard_files))

    if max_concurrent_shards == 1:
        for shard_id, shard_files in pending:
            if fail_after_shards is not None and len(done) >= fail_after_shards:
                raise RuntimeError("injected failure for resume test")
            done[shard_id] = _run_shard(shard_id, shard_files)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrent_shards) as pool:
            futs = {
                pool.submit(_run_shard, sid, sfiles): sid
                for sid, sfiles in pending
            }
            for fut, sid in futs.items():
                done[sid] = fut.result()  # re-raises the first shard failure

    # final aggregate purely from manifests (no data re-read)
    totals: dict[str, int] = defaultdict(int)
    pages_total = 0
    for m in done.values():
        pages_total += m["pages_in"]
        for sink, n in m["counts_by_sink"].items():
            totals[sink] += n
    return {
        "shards": len(shards),
        "pages_in": pages_total,
        "records_out": int(sum(totals.values())),
        "counts_by_sink": dict(sorted(totals.items())),
    }
