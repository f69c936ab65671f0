"""Checkpoint/resume: kill after K shards, resume, outputs + counts identical
to an uninterrupted run; committed shards are not reprocessed."""

import dataclasses
import json
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from otelcol_con_spaneventtolog_ray.config import PipelineConfig
from otelcol_con_spaneventtolog_ray.oracle import run_oracle
from otelcol_con_spaneventtolog_ray.sources.synth import generate_pages_table
from otelcol_con_spaneventtolog_ray.state.checkpoint import (
    committed_shards,
    run_resumable,
)

OBS = 1_755_000_000_000_000_000


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("sharded_pages")
    tbl = generate_pages_table(600, seed=33)
    step = 100
    for i in range(6):
        pq.write_table(tbl.slice(i * step, step), str(d / f"part-{i}.parquet"))
    return str(d), tbl


def test_resume_after_kill(ray_session, sharded_input, tmp_path):
    src, tbl = sharded_input
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    out = str(tmp_path / "ckpt")

    # crash after 2 committed shards (shard_size=2 files -> 3 shards total)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(src, out, cfg, shard_size=2, fail_after_shards=2)
    done = committed_shards(out)
    assert len(done) == 2

    # tamper-proof: record manifest mtimes, resume, verify untouched
    mdir = os.path.join(out, "_manifests")
    before = {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)}
    result = run_resumable(src, out, cfg, shard_size=2)
    after = {f: os.path.getmtime(os.path.join(mdir, f)) for f in before}
    assert before == after  # committed shards skipped, not rewritten
    assert result["shards"] == 3
    assert len(committed_shards(out)) == 3

    pages = [(r["url"], 0, r["text"], r["lang"]) for r in tbl.to_pylist()]
    exp = run_oracle(pages, cfg)
    assert result["pages_in"] == 600
    assert result["records_out"] == len(exp)
    assert result["counts_by_sink"] == dict(sorted(Counter(r.sink for r in exp).items()))

    # written rows match the oracle SET (url/event_name/sink multiset, not
    # just the total — catches duplicate-one-shard/drop-another regressions)
    import pyarrow.dataset as pads

    datasets = [
        os.path.join(out, d) for d in os.listdir(out) if d.startswith("shard=")
    ]
    got_rows = Counter()
    for p in datasets:
        t = pads.dataset(p).to_table(columns=["url", "event_name"])
        # sink is a hive partition column of each shard dir's subdirs
        for u, en in zip(
            t.column("url").to_pylist(), t.column("event_name").to_pylist()
        ):
            got_rows[(u, en)] += 1
    assert got_rows == Counter((r.url, r.event_name) for r in exp)

    # manifest lineage: every input file accounted for exactly once
    seen_files = []
    for m in committed_shards(out).values():
        seen_files.extend(m["input_files"])
    assert sorted(seen_files) == sorted(
        os.path.join(src, f) for f in os.listdir(src)
    )


def test_manifest_guard_on_input_change(ray_session, sharded_input, tmp_path):
    src, _ = sharded_input
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    out = str(tmp_path / "ckpt2")
    run_resumable(src, out, cfg, shard_size=3)
    # corrupt a manifest's input list -> resume must refuse
    mdir = os.path.join(out, "_manifests")
    mf = os.path.join(mdir, sorted(os.listdir(mdir))[0])
    with open(mf) as f:
        m = json.load(f)
    m["input_files"] = ["/bogus.parquet"]
    with open(mf, "w") as f:
        json.dump(m, f)
    with pytest.raises(RuntimeError, match="manifest input mismatch"):
        run_resumable(src, out, cfg, shard_size=3)


def test_shrunk_input_listing_is_rejected(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest

    from otelcol_con_spaneventtolog_ray.sources.synth import generate_pages_table
    from otelcol_con_spaneventtolog_ray.state.checkpoint import run_resumable

    d = tmp_path / "pages"
    d.mkdir()
    for i in range(3):
        pq.write_table(generate_pages_table(50, seed=i), str(d / f"p{i}.parquet"))
    out = str(tmp_path / "out")
    run_resumable(str(d), out, shard_size=1)
    (d / "p2.parquet").unlink()  # input listing shrinks
    with pytest.raises(RuntimeError, match="not in the current input plan"):
        run_resumable(str(d), out, shard_size=1)


def test_resumable_deadletter_committed_with_shard(ray_session, tmp_path):
    """deadletter=True collects malformed lines in the shard's own parse
    pass; the side-band lives under shard=K/_deadletter and survives a
    kill+resume without duplication (it commits with the shard rename)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from otelcol_con_spaneventtolog_ray.sources.synth import PAGES_SCHEMA

    good = (
        "OTEL1 trace=000000000000000000000000000000ff span=00000000000000ff"
        " span_name=s span_kind=Server ts=123 state= name=ok attrs= sattrs= rattrs="
    )
    rows = []
    for i in range(4):
        rows.append(
            {
                "url": f"u{i}", "warc_ts": 0, "html": b"",
                "text": "\n".join([good, f"OTEL1 broken {i}"]),
                "lang": "en",
            }
        )
    src = tmp_path / "pages"
    src.mkdir()
    for i, r in enumerate(rows):
        pq.write_table(
            pa.Table.from_pylist([r], schema=PAGES_SCHEMA),
            str(src / f"part-{i}.parquet"),
        )
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    out = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(str(src), out, cfg, shard_size=2, fail_after_shards=1,
                      deadletter=True)
    res = run_resumable(str(src), out, cfg, shard_size=2, deadletter=True)
    assert res["records_out"] == 4
    dl_dirs = sorted(
        os.path.join(out, d, "_deadletter")
        for d in os.listdir(out)
        if d.startswith("shard=")
    )
    assert len(dl_dirs) == 2 and all(os.path.isdir(d) for d in dl_dirs)
    dead = pa.concat_tables([pads.dataset(d).to_table() for d in dl_dirs])
    assert sorted(dead.column("raw").to_pylist()) == [
        f"OTEL1 broken {i}" for i in range(4)
    ]


def test_concurrent_shards_match_serial(ray_session, sharded_input, tmp_path):
    """max_concurrent_shards overlaps independent shard DAGs without
    changing ANY output: per-shard manifests (counts, lineage) and the
    aggregate equal the serial run's, and a resume on top of a partially
    completed concurrent out_root reprocesses exactly the missing shards."""
    import shutil

    src, _tbl = sharded_input
    cfg = dataclasses.replace(PipelineConfig.default(), observed_timestamp_ns=OBS)
    out_s = str(tmp_path / "serial")
    out_c = str(tmp_path / "conc")

    serial = run_resumable(src, out_s, cfg, shard_size=2)
    conc = run_resumable(src, out_c, cfg, shard_size=2, max_concurrent_shards=3)
    assert serial == conc

    ms, mc = committed_shards(out_s), committed_shards(out_c)
    assert set(ms) == set(mc) == {0, 1, 2}
    for sid in ms:
        for key in ("input_files", "pages_in", "records_out", "counts_by_sink"):
            assert ms[sid][key] == mc[sid][key], (sid, key)

    # knock out one committed shard (manifest + data), resume concurrently:
    # only the missing shard is reprocessed, totals unchanged
    os.remove(os.path.join(out_c, "_manifests", "shard-1.json"))
    shutil.rmtree(os.path.join(out_c, "shard=1"))
    mdir = os.path.join(out_c, "_manifests")
    before = {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)}
    again = run_resumable(src, out_c, cfg, shard_size=2, max_concurrent_shards=3)
    assert again == serial
    after = {f: os.path.getmtime(os.path.join(mdir, f)) for f in before}
    assert before == after  # surviving manifests untouched

    # the crash-injection hook is serial-only by contract
    with pytest.raises(ValueError, match="serial"):
        run_resumable(src, str(tmp_path / "x"), cfg, shard_size=2,
                      fail_after_shards=1, max_concurrent_shards=2)
