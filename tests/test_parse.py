"""Parse stage vs the pure-Python oracle: byte-identical raw extraction,
field fidelity, include filter, malformed-line dead-lettering."""

import pyarrow as pa

from otelcol_con_spaneventtolog_ray.oracle import parse_page
from otelcol_con_spaneventtolog_ray.sources.synth import (
    PAGES_SCHEMA,
    generate_pages_table,
)
from otelcol_con_spaneventtolog_ray.stages.parse import parse_pages_batch


def _oracle_events(tbl):
    out = []
    for r in tbl.to_pylist():
        out.extend(parse_page(r["url"], 0, r["text"], r["lang"]))
    return out


def test_parse_matches_oracle_byte_identical():
    tbl = generate_pages_table(400, seed=13)
    got = parse_pages_batch(tbl).to_pylist()
    exp = _oracle_events(tbl)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["raw"] == e.raw  # byte-identical extracted text per url
        assert g["url"] == e.url
        assert g["event_name"] == e.event_name
        assert g["trace_id"] == e.trace_id
        assert g["span_id"] == e.span_id
        assert g["span_name"] == e.span_name
        assert g["span_kind"] == e.span_kind
        assert g["trace_state"] == e.trace_state
        assert g["event_attrs"] == [(k, f"{t}:{v}") for k, t, v in e.event_attrs]
        assert g["span_attrs"] == [(k, f"{t}:{v}") for k, t, v in e.span_attrs]
        assert g["resource_attrs"] == [(k, f"{t}:{v}") for k, t, v in e.resource_attrs]


def test_include_filter():
    tbl = generate_pages_table(300, seed=5)
    exp = _oracle_events(tbl)
    got = parse_pages_batch(tbl, ("exception", "custom"))
    want = [e for e in exp if e.event_name in ("exception", "custom")]
    assert got.num_rows == len(want)
    assert got.column("event_name").to_pylist() == [e.event_name for e in want]


def _page_with(text):
    return pa.Table.from_pylist(
        [{"url": "u", "warc_ts": 0, "html": b"", "text": text, "lang": "en"}],
        schema=PAGES_SCHEMA,
    )


def test_malformed_lines_dead_lettered():
    good = (
        "OTEL1 trace=000000000000000000000000000000ff span=00000000000000ff"
        " span_name=s span_kind=Server ts=123 state= name=ok attrs= sattrs= rattrs="
    )
    cases = [
        "OTEL1 truncated line",  # wrong token count
        "OTEL1 " + " ".join(["x="] * 10),  # wrong prefixes
        good.replace("trace=000000000000000000000000000000ff", "trace=zz"),  # short hex
        good.replace("000000000000000000000000000000ff", "zz0000000000000000000000000000gg"),  # bad hex chars
        good.replace("ts=123", "ts=abc"),  # non-int timestamp
    ]
    text = "\n".join(cases + [good, "filler"])
    out = parse_pages_batch(_page_with(text))
    assert out.num_rows == 1
    assert out.column("raw")[0].as_py() == good
    assert out.column("event_name")[0].as_py() == "ok"
    # oracle agrees
    assert len(parse_page("u", 0, text, "en")) == 1


def test_zero_event_pages_produce_no_rows():
    out = parse_pages_batch(_page_with("no events here\njust prose"))
    assert out.num_rows == 0


def test_deadletter_captures_malformed_lines():
    from otelcol_con_spaneventtolog_ray.stages.parse import make_deadletter_fn

    good = (
        "OTEL1 trace=000000000000000000000000000000ff span=00000000000000ff"
        " span_name=s span_kind=Server ts=123 state= name=ok attrs= sattrs= rattrs="
    )
    bad = [
        "OTEL1 truncated line",
        good.replace("ts=123", "ts=abc"),
        good.replace("trace=000000000000000000000000000000ff", "trace=zz"),
    ]
    text = "\n".join([bad[0], good, "prose", bad[1], bad[2]])
    out = make_deadletter_fn()(_page_with(text))
    assert sorted(out.column("raw").to_pylist()) == sorted(bad)
    # reasons name the rejecting validity stage (one-pass collection)
    assert set(out.column("reason").to_pylist()) == {
        "bad_token_count", "bad_field_or_ts",
    }
    assert set(out.column("url").to_pylist()) == {"u"}
    # clean pages produce an empty dead-letter table with the right schema
    empty = make_deadletter_fn()(_page_with(good))
    assert empty.num_rows == 0 and empty.schema.names == ["url", "raw", "reason"]


def test_run_pipeline_deadletter_sink(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from otelcol_con_spaneventtolog_ray.pipelines.telemetry import run_pipeline

    good = (
        "OTEL1 trace=000000000000000000000000000000ff span=00000000000000ff"
        " span_name=s span_kind=Server ts=123 state= name=ok attrs= sattrs= rattrs="
    )
    tbl = _page_with("\n".join([good, "OTEL1 truncated line", "prose"]))
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(tbl, str(src / "p.parquet"))
    out = str(tmp_path / "out")
    counts = run_pipeline(str(src), out, deadletter=True)
    assert sum(counts.values()) == 1  # only the good line routed
    import pyarrow.dataset as pads

    dl = pads.dataset(f"{out}/_deadletter").to_table()
    assert dl.column("raw").to_pylist() == ["OTEL1 truncated line"]


def test_one_pass_deadletter_matches_reparse_diff():
    """The single-pass collected dead-letters must equal the reference
    two-pass definition: an OTEL1 line is malformed iff re-parsing it as its
    own page yields no event (the round-1 implementation's diff)."""
    import pyarrow.compute as pc

    from otelcol_con_spaneventtolog_ray.stages.parse import (
        make_deadletter_fn,
        parse_pages_batch,
    )

    good = (
        "OTEL1 trace=000000000000000000000000000000ff span=00000000000000ff"
        " span_name=s span_kind=Server ts=123 state= name=ok attrs= sattrs= rattrs="
    )
    lines = [
        good,
        "OTEL1 truncated",
        good.replace("ts=123", "ts=12x"),
        good.replace("ts=123", "ts=99999999999999999999999999"),
        good.replace("trace=000000000000000000000000000000ff", "trace=" + "zz" * 16),
        good.replace("span_kind=", "spankind="),
        "OTEL1 " + " ".join(["x"] * 10),
        good.replace("name=ok", "name=other"),
        "prose OTEL1 not-at-start",
    ]
    batch = _page_with("\n".join(lines))
    got = make_deadletter_fn()(batch)
    # reference: re-parse each OTEL1 line as a one-line page, diff survivors
    exp = []
    for ln in lines:
        if not ln.startswith("OTEL1 "):
            continue
        probe = _page_with(ln)
        if parse_pages_batch(probe).num_rows == 0:
            exp.append(ln)
    assert sorted(got.column("raw").to_pylist()) == sorted(exp)
    assert len(exp) == 6
    # and parse itself is unaffected by the collection flag
    ev_plain = parse_pages_batch(batch)
    ev_col, dead = parse_pages_batch(batch, collect_malformed=True)
    assert ev_plain.equals(ev_col)
    assert dead.num_rows == len(exp)
