"""End-to-end Ray Data pipeline tests: routed-row set equality per sink,
per-sink count equality (footer counts AND salted two-phase aggregate),
empty-sink suppression — all against the pure-Python oracle."""

import dataclasses
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from otelcol_con_spaneventtolog_ray.config import PipelineConfig
from otelcol_con_spaneventtolog_ray.oracle import run_oracle
from otelcol_con_spaneventtolog_ray.sources.synth import generate_pages_table
from otelcol_con_spaneventtolog_ray.pipelines.telemetry import (
    build_log_records,
    read_pages,
    run_pipeline,
    sink_counts,
)

OBS = 1_755_000_000_000_000_000
N_PAGES = 1200


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    tbl = generate_pages_table(N_PAGES, seed=21)
    # multiple files so sharding/parallel read paths are exercised
    third = N_PAGES // 3
    for i in range(3):
        pq.write_table(
            tbl.slice(i * third, third if i < 2 else N_PAGES - 2 * third),
            str(d / f"part-{i}.parquet"),
        )
    return str(d), tbl


@pytest.fixture(scope="module")
def oracle_records(pages_dir):
    _, tbl = pages_dir
    pages = [(r["url"], 0, r["text"], r["lang"]) for r in tbl.to_pylist()]
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    return run_oracle(pages, cfg)


def test_routed_rows_and_counts(ray_session, pages_dir, oracle_records, tmp_path):
    src, _ = pages_dir
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    out = str(tmp_path / "routed")
    counts = run_pipeline(src, out, cfg)
    exp_counts = Counter(r.sink for r in oracle_records)
    assert counts == dict(exp_counts)

    # routed-row SET equality per sink, timestamps compared as integer ns
    import pyarrow as pa
    import pyarrow.compute as pc

    read_back = pq.read_table(out)
    ts_ns = pc.cast(read_back.column("timestamp"), pa.int64()).to_pylist()
    got_rows = set()
    for r, ts in zip(read_back.to_pylist(), ts_ns):
        got_rows.add(
            (r["url"], ts, r["severity_number"], r["severity_text"],
             r["body"], tuple(r["attributes"]), r["trace_id"], r["span_id"],
             str(r["sink"]))
        )
    exp_rows = {
        (r.url, r.timestamp_ns, r.severity_number, r.severity_text, r.body,
         tuple(r.attributes.items()), r.trace_id, r.span_id, r.sink)
        for r in oracle_records
    }
    assert got_rows == exp_rows
    # sink dirs exist only for non-empty sinks
    sinks_on_disk = {d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("sink=")}
    assert sinks_on_disk == set(exp_counts)


def test_two_phase_counts(ray_session, pages_dir, oracle_records):
    src, _ = pages_dir
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    records = build_log_records(read_pages(src), cfg)
    ct = sink_counts(records, num_salts=4)
    got = dict(zip(ct.column("sink").to_pylist(), ct.column("n").to_pylist()))
    assert got == dict(Counter(r.sink for r in oracle_records))


def test_unfused_stages_match(ray_session, pages_dir, oracle_records):
    src, _ = pages_dir
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    records = build_log_records(read_pages(src), cfg, fused=False)
    assert records.count() == len(oracle_records)


def test_no_output_when_filter_never_matches(ray_session, pages_dir, tmp_path):
    # TestNoEmptyLogsWhenNoMatchingEvents analog at the sink level
    src, _ = pages_dir
    cfg = dataclasses.replace(
        PipelineConfig(include_event_names=("nonexistent_event",)),
        observed_timestamp_ns=OBS,
    )
    out = str(tmp_path / "empty")
    counts = run_pipeline(src, out, cfg)
    assert counts == {}
    files = [f for _r, _d, fs in os.walk(out) for f in fs if f.endswith(".parquet")]
    assert files == []


def test_salted_aggregate_under_total_skew(ray_session):
    """100% of rows on ONE key: the salted two-phase path must still count
    exactly (partials spread over salts, then folded)."""
    import pyarrow as pa
    import ray.data

    from otelcol_con_spaneventtolog_ray.stages.aggregate import counts_table

    n = 50_000
    ds = ray.data.from_arrow(
        pa.table({"sink": pa.array(["error"] * n, pa.string())})
    ).repartition(8)
    tbl = counts_table(ds, ["sink"], num_salts=8)
    assert tbl.to_pydict() == {"sink": ["error"], "n": [n]}


def test_parse_stats_counts_malformed(ray_session):
    import pyarrow as pa

    from otelcol_con_spaneventtolog_ray.sources.synth import PAGES_SCHEMA
    from otelcol_con_spaneventtolog_ray.stages.parse import make_parse_stats_fn

    good = (
        "OTEL1 trace=000000000000000000000000000000ff span=00000000000000ff"
        " span_name=s span_kind=Server ts=123 state= name=ok attrs= sattrs= rattrs="
    )
    text = "\n".join([good, "OTEL1 bad line", "prose", good.replace("ts=123", "ts=x")])
    batch = pa.Table.from_pylist(
        [{"url": "u", "warc_ts": 0, "html": b"", "text": text, "lang": "en"}],
        schema=PAGES_SCHEMA,
    )
    row = make_parse_stats_fn(("nomatch",))(batch).to_pylist()[0]
    assert row == {
        "pages": 1, "lines_total": 4, "otel_lines": 3,
        "total_events_found": 1, "events_processed": 0, "malformed_lines": 2,
    }


def test_read_pages_json_and_csv_match_parquet(ray_session, tmp_path):
    """The same pages through json-lines and csv ingest produce identical
    log records to the parquet path."""
    import json as jsonlib

    import pyarrow as pa
    import pyarrow.compute as pc

    tbl = generate_pages_table(120, seed=33)
    pq.write_table(tbl, str(tmp_path / "p.parquet"))
    ts_us = pc.cast(tbl.column("warc_ts"), pa.int64()).to_pylist()
    with open(tmp_path / "p.jsonl", "w") as f:
        for r, us in zip(tbl.to_pylist(), ts_us):
            f.write(jsonlib.dumps({
                "url": r["url"], "warc_ts": us,
                "text": r["text"], "lang": r["lang"],
            }) + "\n")
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)

    def records(fmt, path):
        ds = build_log_records(read_pages(path, format=fmt), cfg)
        t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        return sorted(
            zip(
                t.column("url").to_pylist(),
                t.column("event_name").to_pylist(),
                pc.cast(t.column("timestamp"), pa.int64()).to_pylist(),
                t.column("severity_text").to_pylist(),
            )
        )

    # csv with quoted multi-line text values
    pd_df = tbl.to_pandas()
    pd_df["warc_ts"] = ts_us
    pd_df[["url", "warc_ts", "text", "lang"]].to_csv(
        str(tmp_path / "p.csv"), index=False
    )
    got_pq = records("parquet", str(tmp_path / "p.parquet"))
    got_js = records("json", str(tmp_path / "p.jsonl"))
    got_csv = records("csv", str(tmp_path / "p.csv"))
    assert got_js == got_pq and got_csv == got_pq and len(got_pq) > 0


def test_run_pipeline_refuses_dirty_out_dir(ray_session, pages_dir, tmp_path):
    """Rerunning into a directory that already holds parquet output must be
    refused — footer-based counts would silently mix stale rows otherwise."""
    src, _ = pages_dir
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    out = str(tmp_path / "routed")
    run_pipeline(src, out, cfg)
    with pytest.raises(ValueError, match="refusing to mix"):
        run_pipeline(src, out, cfg)


def test_fingerprint_whitespace_is_ascii_class():
    """Fingerprint normalization collapses exactly the RE2 '\\s' class
    ([\\t\\n\\f\\r\\v ]) — Unicode spaces (\\xa0, U+2028) pass through, so the
    Python side can't diverge from the DuckDB regexp_replace mirror."""
    import hashlib

    import pyarrow as pa

    from otelcol_con_spaneventtolog_ray.functions.textstats import (
        fingerprint_batch,
    )

    texts = ["a\tb", "a\xa0b", "a b", "a \x0b b"]
    out = fingerprint_batch(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).column("fingerprint").to_pylist()
    assert out[0] == hashlib.md5(b"a b").hexdigest()          # tab collapsed
    assert out[1] == hashlib.md5("a\xa0b".encode()).hexdigest()  # NBSP kept
    assert out[2] == hashlib.md5("a b".encode()).hexdigest()
    assert out[3] == hashlib.md5(b"a b").hexdigest()          # ' \x0b ' run
