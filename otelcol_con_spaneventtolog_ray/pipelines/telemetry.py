"""The flagship parse -> enrich -> route -> aggregate pipeline composition.

Ray-Data-first: one lazy Dataset plan, streaming execution end-to-end, no
mid-pipeline materialization. Stage layout (SURVEY.md §3):

    read_parquet(pages, columns=[url warc_ts text lang])   # html pruned at read
      -> map_batches(parse)                                # stateless flat-map
      -> map_batches(enrich)                               # worker-cached state
      -> write_parquet(partition_cols=["sink"])            # no-shuffle fan-out
      +> counts_by(["sink"])                               # salted two-phase

Execution modes for the stateful enrich (measured on this box, 2M pages /
3M events, 32 cpus):

* ``enrich_mode="tasks"`` (default): fused parse+enrich as a task-pool stage
  whose compiled config state (include set, substring rules, severity vocab)
  is built once per WORKER PROCESS and cached (module-level keyed by config)
  — the broadcast-lookup-state pattern without per-execution actor pool
  spin-up. 2.6 s end-to-end incl. partitioned write (~1.15M events/s).
* ``enrich_mode="actors"``: explicit ``map_batches(Cls, concurrency=N)``
  actor pool — same semantics, pays ~2 s pool startup per execution; use for
  heavy per-worker state (models, big dictionaries). 6.6 s on the same input.

Block sizing matters more than either: the streaming executor spends ~10 ms
per block, so ``read_pages`` defaults to ~2 blocks per CPU bounded by
~128 MB in-memory per block (observed 2.75 s -> 0.55 s for a full 2M-page
read pass when going from 201 to 32 blocks).

None of these functions call ray.init(); the session is owned by the caller.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

import ray.data

from ..config import PipelineConfig
from ..stages.aggregate import counts_table
from ..stages.enrich import Enricher
from ..stages.parse import make_parse_fn, parse_pages_batch

PAGE_COLUMNS = ["url", "warc_ts", "text", "lang"]

TARGET_BLOCK_BYTES = 128 * 1024 * 1024  # in-memory target per block
_PARQUET_INFLATION = 3  # rough snappy-parquet -> Arrow in-memory factor


def _cluster_cpus() -> int:
    import ray as _ray

    if _ray.is_initialized():
        return int(_ray.cluster_resources().get("CPU", 4))
    return 4


def auto_num_blocks(paths: str | list[str]) -> int | None:
    """~4 blocks per CPU, but never above ~TARGET_BLOCK_BYTES per block.
    (Measured: 4/CPU smooths the uneven-task tail at 8 cpus — 5.6s -> 4.8s
    on 2M pages — and is within noise of 2/CPU at 32 cpus.)

    Fewer, larger blocks amortize the executor's per-block cost; the byte
    bound keeps batch x concurrency inside worker heaps at scale. Returns
    None (let Ray decide) when input sizes can't be inspected locally.
    """
    import os

    try:
        files: list[str] = []
        for p in paths if isinstance(paths, list) else [paths]:
            if os.path.isdir(p):
                files += [
                    os.path.join(r, f)
                    for r, _d, fs in os.walk(p)
                    for f in fs
                    if f.endswith(".parquet")
                ]
            elif os.path.isfile(p):
                files.append(p)
        if not files:
            return None
        est_bytes = sum(os.path.getsize(f) for f in files) * _PARQUET_INFLATION
    except OSError:
        return None
    # 4 blocks/CPU smooths the uneven-task tail at low parallelism (measured
    # 5.6s -> 4.8s at 8 cpus) but per-block overhead bites at high counts
    # (128 blocks at 32 cpus measured ~15% slower than 64) -> cap growth
    cpus = _cluster_cpus()
    by_cpu = min(4 * cpus, max(2 * cpus, 64))
    by_bytes = max(1, est_bytes // TARGET_BLOCK_BYTES)
    return int(max(by_cpu, by_bytes))


def read_pages(
    paths: str | list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None | str = "auto",
    format: str = "parquet",
) -> "ray.data.Dataset":
    """Column-pruned scan of the pages table — `html` never leaves storage.

    `format`: 'parquet' (default; columns pruned at the read so only needed
    bytes leave storage), 'json' (json-lines), or 'csv'. The non-columnar
    formats can't push the projection into the scan, so the column prune
    happens in a select right after the read.
    """
    columns = columns or PAGE_COLUMNS
    if override_num_blocks == "auto":
        override_num_blocks = auto_num_blocks(paths) if format == "parquet" else None
    nb = (
        {"override_num_blocks": override_num_blocks}
        if override_num_blocks is not None
        else {}
    )
    if format == "parquet":
        return ray.data.read_parquet(paths, columns=columns, **nb)
    if format == "json":
        ds = ray.data.read_json(paths, **nb)
    elif format == "csv":
        from pyarrow import csv as pacsv

        # page text embeds newlines (the OTEL1 event lines), so quoted
        # multi-line values must be enabled
        ds = ray.data.read_csv(
            paths,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            **nb,
        )
    else:
        raise ValueError(f"unsupported pages format: {format!r}")
    present = [c for c in columns if c in ds.schema().names]
    ds = ds.select_columns(present)
    if "warc_ts" in present:
        # json/csv carry warc_ts as int64 µs; normalize to the parquet schema
        def _norm(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("warc_ts")
            if not pa.types.is_timestamp(t.schema.field(i).type):
                import pyarrow.compute as pc

                t = t.set_column(
                    i, "warc_ts", pc.cast(t.column("warc_ts"), pa.timestamp("us"))
                )
            return t

        ds = ds.map_batches(_norm, batch_format="pyarrow")
    return ds


class ParseEnrich:
    """Fused parse+enrich callable: config rules compiled once per instance
    (connector.go:95-112 analog — eventNameSet / severity dicts / substring
    rules), reused across batches via actor state or the process cache.

    ``deadletter_dir`` turns on single-read audit mode: the SAME parse pass
    collects malformed OTEL1 lines (parse_pages_batch collect_malformed) and
    each batch's dead rows are written as one side-band parquet file whose
    name is a content hash — task retries rewrite the identical file, so the
    side channel stays idempotent without coordination."""

    def __init__(self, cfg_dict: dict, deadletter_dir: str | None = None):
        self.cfg = PipelineConfig.from_dict(cfg_dict)
        self.include = tuple(self.cfg.include_event_names)
        self.enricher = Enricher(self.cfg)
        self.deadletter_dir = deadletter_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.deadletter_dir is None:
            return self.enricher(parse_pages_batch(batch, self.include))
        events, dead = parse_pages_batch(
            batch, self.include, collect_malformed=True
        )
        if dead.num_rows:
            self._write_dead(dead, batch)
        return self.enricher(events)

    def _write_dead(self, dead: pa.Table, batch: pa.Table) -> None:
        import hashlib
        import os

        import pyarrow.parquet as pq

        # key = identity of the INPUT BATCH (every page url, in order) plus
        # the dead rows: a task retry re-parses the identical batch and
        # rewrites the identical file (idempotent), while the same poison
        # line arriving on other pages — or on byte-identical recrawled
        # pages split into a different batch — gets a distinct file. Only
        # two fully identical input batches collapse, which is the dedup we
        # want. Fields are length-prefixed (no separator ambiguity) and a
        # NULL url (possible via json/csv ingest) must not kill the channel.
        h = hashlib.sha1()

        def upd(v):
            b = (v or "").encode("utf-8", "surrogatepass")
            h.update(len(b).to_bytes(8, "little"))
            h.update(b)

        for u in batch.column("url").to_pylist():
            upd(u)
        h.update(b"\xff")
        for u, r in zip(
            dead.column("url").to_pylist(), dead.column("raw").to_pylist()
        ):
            upd(u)
            upd(r)
        key = h.hexdigest()[:20]
        self._write_dead_file(dead, f"dead-{key}.parquet")

    def _write_dead_file(self, dead: pa.Table, name: str) -> None:
        """Filesystem-aware side-band write: local paths get tmp+rename
        atomicity; URI paths (s3://, ...) resolve through pyarrow.fs and
        write the final name directly (same-content overwrite is the
        idempotence contract). Multi-node clusters writing to a plain local
        path need it shared — the same requirement the main write_parquet
        output has."""
        import os

        import pyarrow.parquet as pq

        if "://" in self.deadletter_dir:
            from pyarrow import fs as pafs

            fsys, base = pafs.FileSystem.from_uri(self.deadletter_dir)
            fsys.create_dir(base, recursive=True)
            with fsys.open_output_stream(f"{base}/{name}") as sink:
                pq.write_table(dead, sink)
            return
        os.makedirs(self.deadletter_dir, exist_ok=True)
        tmp = os.path.join(self.deadletter_dir, f".{name}.tmp")
        pq.write_table(dead, tmp)
        os.replace(tmp, os.path.join(self.deadletter_dir, name))


# worker-process-local cache: stateful setup once per worker, not per batch
_PROCESS_CACHE: dict[str, ParseEnrich] = {}


def make_fused_fn(cfg_dict: dict, deadletter_dir: str | None = None):
    key = json.dumps(cfg_dict, sort_keys=True, default=str) + (
        f"|dl:{deadletter_dir}" if deadletter_dir else ""
    )

    def _parse_enrich(batch: pa.Table) -> pa.Table:
        pe = _PROCESS_CACHE.get(key)
        if pe is None:
            pe = _PROCESS_CACHE[key] = ParseEnrich(cfg_dict, deadletter_dir)
        return pe(batch)

    return _parse_enrich


def _cfg_dict(cfg: PipelineConfig) -> dict:
    from dataclasses import asdict

    d = asdict(cfg)
    d["attribute_mappings"] = {k: v for k, v in d["attribute_mappings"].items() if v}
    d["include_event_names"] = list(d["include_event_names"])
    d["log_attributes_from"] = list(d["log_attributes_from"])
    return d


def build_log_records(
    pages: "ray.data.Dataset",
    cfg: PipelineConfig,
    *,
    enrich_mode: str = "tasks",
    fused: bool = True,
    batch_size: int | None = 16384,
    enrich_concurrency: int | tuple[int, int] | None = None,
    deadletter_dir: str | None = None,
) -> "ray.data.Dataset":
    """Lazy Dataset of log records (LOG_RECORDS_SCHEMA) from a pages Dataset.

    enrich_mode='tasks' (default) runs the fused stage on the task pool with
    per-worker cached state; 'actors' uses an explicit actor pool.

    batch_size defaults to 16384 pages: the parse kernels make ~15 passes
    over the text, so per-task peak heap is ~10x the batch bytes — unbounded
    (block-sized) batches at full parallelism were measured to push this box
    into swap (13 s -> 58 s cliff). Blocks stay large (cheap for the
    executor); only the UDF window is capped.
    """
    from ..rayenv import remote_kwargs

    cfg.validate()
    common: dict[str, Any] = {"batch_format": "pyarrow", **remote_kwargs()}
    if batch_size is not None:
        common["batch_size"] = batch_size
    cd = _cfg_dict(cfg)
    if enrich_mode not in ("tasks", "actors"):
        raise ValueError(f"unknown enrich_mode: {enrich_mode!r} (tasks|actors)")
    if deadletter_dir is not None and not fused:
        raise ValueError("deadletter_dir requires the fused parse stage")
    if enrich_mode == "tasks":
        if fused:
            return pages.map_batches(make_fused_fn(cd, deadletter_dir), **common)
        parsed = pages.map_batches(make_parse_fn(tuple(cfg.include_event_names)), **common)
        return parsed.map_batches(make_enrich_fn(cd), **common)
    if enrich_concurrency is None:
        # leave scheduling headroom for read/write tasks (a saturated pool
        # starves the scan: 30/32 actors measured 2x slower than 26/32)
        enrich_concurrency = max(2, _cluster_cpus() - 6)
    actor_kwargs = dict(common)
    actor_kwargs["concurrency"] = enrich_concurrency
    if fused:
        return pages.map_batches(
            ParseEnrich, fn_constructor_args=(cd, deadletter_dir), **actor_kwargs
        )
    parsed = pages.map_batches(make_parse_fn(tuple(cfg.include_event_names)), **common)
    return parsed.map_batches(Enricher, fn_constructor_args=(cd,), **actor_kwargs)


def make_enrich_fn(cfg_dict: dict):
    """Enrich-only task fn with per-worker cached compiled config."""
    key = "enrich:" + json.dumps(cfg_dict, sort_keys=True, default=str)

    def _enrich(batch: pa.Table) -> pa.Table:
        pe = _PROCESS_CACHE.get(key)
        if pe is None:
            cfg = PipelineConfig.from_dict(cfg_dict)
            pe = _PROCESS_CACHE[key] = Enricher(cfg)  # type: ignore[assignment]
        return pe(batch)

    return _enrich


def sink_counts(records: "ray.data.Dataset", num_salts: int = 8) -> pa.Table:
    """Per-sink counts via salted two-phase aggregation (small result table)."""
    return counts_table(records, ["sink"], num_salts)


def run_pipeline(
    input_paths: str | list[str],
    out_dir: str,
    cfg: PipelineConfig | None = None,
    deadletter: bool = False,
    **build_kwargs: Any,
) -> dict[str, int]:
    """One-shot, non-resumable run: routed Parquet out + per-sink counts.

    Single streaming consumption: the write is the only full pass; counts
    come from the written files' parquet footers (stages/route.py).
    ``deadletter=True`` turns on single-read audit mode: the SAME parse pass
    collects every malformed OTEL1 line and side-band-writes it to
    ``out_dir/_deadletter/`` (poison pills never kill the job, stay
    inspectable, and the input is not read twice).
    """
    import os

    from ..stages.route import routed_counts_from_footers, write_routed

    cfg = cfg or PipelineConfig.default()
    # stale-output guard (mirrors the resumable runner's): counts come from
    # parquet footers of EVERYTHING under out_dir, so rerunning into a dirty
    # directory would silently mix stale rows into output and inflate counts
    if os.path.isdir(out_dir):
        stale = [
            os.path.join(r, f)
            for r, _d, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
        if stale:
            raise ValueError(
                f"out_dir {out_dir!r} already contains {len(stale)} parquet"
                " file(s); refusing to mix runs — use a fresh directory or the"
                " resumable runner (state/checkpoint.py), which resumes safely"
            )
    if deadletter:
        build_kwargs.setdefault(
            "deadletter_dir", os.path.join(out_dir, "_deadletter")
        )
    records = build_log_records(read_pages(input_paths), cfg, **build_kwargs)
    write_routed(records, out_dir)
    return routed_counts_from_footers(out_dir)
