"""CLI: run the flagship parse -> enrich -> route -> aggregate pipeline.

The standalone analog of wiring the connector into a Collector pipeline via
YAML (reference factory.go:18-43): point it at a pages Parquet directory and
a YAML config using the connector's exact key vocabulary, get routed
partitioned Parquet plus per-sink counts.

    python -m otelcol_con_spaneventtolog_ray INPUT OUT [--config cfg.yaml]
        [--resumable] [--shard-size N] [--max-concurrent-shards C]
        [--num-cpus N]

Any registered analysis pipeline (the functions/ registry — dedup,
similarity, text, multimodal, events, sketches, corpus; full inventory in
COVERAGE.md) runs directly against a scale-factor table directory:

    python -m otelcol_con_spaneventtolog_ray --query NAME SF_DIR OUT
    python -m otelcol_con_spaneventtolog_ray --list-queries

writing the result as Parquet to OUT (one file; results are small) and
printing a one-line JSON summary.

Owns its Ray session (guarded init; the driver/test contract never imports
this module).
"""

from __future__ import annotations

import argparse
import json
import sys


def _run_query(name: str, sf_dir: str, out: str) -> dict:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .functions import entry_queries

    if name not in entry_queries.QUERIES:
        raise SystemExit(
            f"unknown query {name!r}; --list-queries shows the inventory"
        )
    res = entry_queries.QUERIES[name](sf_dir)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    if isinstance(res, pd.DataFrame):
        res = pa.Table.from_pandas(res, preserve_index=False)
    pq.write_table(res, out)
    return {"query": name, "rows": res.num_rows, "columns": res.schema.names,
            "out": out}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="otelcol_con_spaneventtolog_ray")
    ap.add_argument("input", nargs="?", help="pages Parquet file or directory"
                    " (for --query: the scale-factor table directory)")
    ap.add_argument("output", nargs="?", help="output directory (partitioned"
                    " by sink); for --query: the output parquet file path")
    ap.add_argument("--query", help="run a registered analysis pipeline by"
                    " name instead of the flagship telemetry pipeline")
    ap.add_argument("--list-queries", action="store_true",
                    help="print the registered query names and exit")
    ap.add_argument("--config", help="YAML pipeline config (connector vocabulary)")
    ap.add_argument("--resumable", action="store_true",
                    help="manifest-per-shard checkpointing; re-running skips "
                         "committed shards")
    ap.add_argument("--shard-size", type=int, default=16,
                    help="input files per resumable shard")
    ap.add_argument("--max-concurrent-shards", type=int, default=1,
                    help="overlap this many resumable shard executions "
                         "(driver threads; commit/resume semantics "
                         "unchanged)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--deadletter", action="store_true",
                    help="also write malformed OTEL1 lines to OUT/_deadletter/")
    args = ap.parse_args(argv)

    if args.list_queries:
        from .functions import entry_queries

        entry_queries.resolve_lazy_oracles()  # lazy SQL counts as gated
        for name in sorted(entry_queries.QUERIES):
            kind = "sql-gated" if name in entry_queries.ORACLE_SQL else "rows-only"
            print(f"{name}\t{kind}")
        return 0
    if args.input is None or args.output is None:
        ap.error("input and output are required (except with --list-queries)")
    if args.query:  # validate BEFORE paying Ray startup
        from .functions import entry_queries

        if args.query not in entry_queries.QUERIES:
            ap.error(
                f"unknown query {args.query!r}; --list-queries shows the"
                " inventory"
            )
        # flags below only configure the flagship telemetry pipeline; a
        # silent ignore would let a user think their YAML applied to a query
        conflicting = [
            flag for flag, on in (
                ("--config", args.config),
                ("--resumable", args.resumable),
                ("--deadletter", args.deadletter),
                ("--shard-size", args.shard_size != 16),
                ("--max-concurrent-shards", args.max_concurrent_shards != 1),
            ) if on
        ]
        if conflicting:
            ap.error(
                f"--query does not take {', '.join(conflicting)} (those"
                " apply only to the flagship telemetry pipeline)"
            )

    import ray

    from .config import PipelineConfig
    from .pipelines.telemetry import run_pipeline
    from .state.checkpoint import run_resumable

    started = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
        started = True
    try:
        if args.query:
            print(json.dumps(_run_query(args.query, args.input, args.output)))
            return 0
        cfg = (
            PipelineConfig.from_yaml(args.config)
            if args.config
            else PipelineConfig.default()
        )
        if args.resumable:
            # deadletter=True collects malformed lines inside each shard's
            # parse pass (single read; committed atomically with the shard)
            result = run_resumable(
                args.input, args.output, cfg, shard_size=args.shard_size,
                deadletter=args.deadletter,
                max_concurrent_shards=args.max_concurrent_shards,
            )
        else:
            counts = run_pipeline(
                args.input, args.output, cfg, deadletter=args.deadletter
            )
            result = {
                "records_out": int(sum(counts.values())),
                "counts_by_sink": counts,
            }
        print(json.dumps(result))
        return 0
    finally:
        if started:  # never tear down a caller-owned session
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
