"""CLI: YAML config -> routed parquet + counts, resumable mode skips shards."""

import json

import pyarrow.parquet as pq

from otelcol_con_spaneventtolog_ray.__main__ import main
from otelcol_con_spaneventtolog_ray.sources.synth import generate_pages_table


def _write_pages(tmp_path, n_files=2, pages=120):
    d = tmp_path / "pages"
    d.mkdir()
    for i in range(n_files):
        pq.write_table(
            generate_pages_table(pages, seed=i), str(d / f"part-{i}.parquet")
        )
    return str(d)


def test_cli_run_with_yaml_config(ray_session, tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "include_event_names: [exception, custom]\n"
        "severity_by_event_name:\n  exception: error\n"
    )
    pages = _write_pages(tmp_path)
    out = str(tmp_path / "out")
    assert main([pages, out, "--config", str(cfg)]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["records_out"] == sum(result["counts_by_sink"].values())
    assert set(result["counts_by_sink"]) <= {"error", "info"}
    assert result["records_out"] > 0
    # routed partition dirs exist and fsum matches
    sinks = {p.name for p in (tmp_path / "out").iterdir() if p.is_dir()}
    assert sinks == {f"sink={s}" for s in result["counts_by_sink"]}


def test_cli_resumable(ray_session, tmp_path, capsys):
    pages = _write_pages(tmp_path, n_files=3)
    out = str(tmp_path / "out")
    assert main([pages, out, "--resumable", "--shard-size", "1"]) == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["shards"] == 3
    # second run: all shards committed, identical totals
    assert main([pages, out, "--resumable", "--shard-size", "1"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["counts_by_sink"] == r1["counts_by_sink"]


def test_cli_query_runner(ray_session, tmp_path):
    """--query runs any registered pipeline against a table dir and writes
    parquet; --list-queries prints the inventory with gate kinds."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq

    from otelcol_con_spaneventtolog_ray.__main__ import main

    out = str(tmp_path / "res.parquet")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["--query", "text_stats", "/root/testdata/sf0.001", out])
    assert rc == 0
    info = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert info["rows"] == 500 and "quality" in info["columns"]
    assert pq.read_table(out).num_rows == 500

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["--list-queries"])
    assert rc == 0
    lines = dict(l.split("\t") for l in buf.getvalue().strip().splitlines())
    assert lines["text_stats"] == "sql-gated"
    # upgraded from rows-only in round 5 (exact band-bucket SQL mirror)
    assert lines["dedup_minhash_keep"] == "sql-gated"
    # at least one genuinely non-SQL-expressible op stays rows-only
    assert "rows-only" in lines.values()
    # the functions/ registry (the telemetry pipeline itself is the CLI's
    # default mode; pipeline_* variants live in the driver contract)
    assert len(lines) >= 35


def test_cli_query_rejects_flagship_only_flags(tmp_path):
    """--query with flags that only configure the flagship pipeline must
    error loudly instead of silently ignoring them."""
    import pytest

    from otelcol_con_spaneventtolog_ray.__main__ import main

    out = str(tmp_path / "res.parquet")
    for extra in (["--config", "x.yaml"], ["--resumable"],
                  ["--deadletter"], ["--shard-size", "4"]):
        with pytest.raises(SystemExit) as ei:
            main(["--query", "text_stats", "/root/testdata/sf0.001", out]
                 + extra)
        assert ei.value.code == 2
