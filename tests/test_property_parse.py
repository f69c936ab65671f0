"""Property-based equivalence vs the pure-Python oracle: (1) parse over
hypothesis-generated pages with escape-heavy field values, malformed junk
lines, and boundary timestamps; (2) the full enrich chain over
hypothesis-generated CONFIGS (every severity-precedence / projection /
mapping combination), both against the reference-literal oracle."""

import dataclasses

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from otelcol_con_spaneventtolog_ray.config import AttributeMappings, PipelineConfig
from otelcol_con_spaneventtolog_ray.oracle import parse_page, run_oracle
from otelcol_con_spaneventtolog_ray.sources.synth import (
    PAGES_SCHEMA,
    build_line,
    generate_pages_table,
)
from otelcol_con_spaneventtolog_ray.stages.enrich import enrich_events_batch
from otelcol_con_spaneventtolog_ray.stages.parse import parse_pages_batch

# escape-exercising text: printable ASCII incl. all escaped chars + unicode
FIELD_TEXT = st.text(
    alphabet=st.sampled_from(list(" =;%\n:abcXYZ09._äπ")), max_size=12
)
ATTRS = st.lists(
    st.tuples(FIELD_TEXT, st.sampled_from(["s", "i", "d", "b"]), FIELD_TEXT),
    max_size=3,
)
HEX32 = st.integers(0, (1 << 128) - 1).map(lambda v: f"{v:032x}")
HEX16 = st.integers(0, (1 << 64) - 1).map(lambda v: f"{v:016x}")
TS = st.one_of(
    st.integers(-(2**63) - 2, -(2**63) + 2),
    st.integers(-5, 5),
    st.integers(2**63 - 2, 2**63 + 2),
    st.integers(10**18, 2 * 10**18),
)

VALID_LINE = st.builds(
    build_line,
    trace_hex32=HEX32,
    span_hex16=HEX16,
    span_name=FIELD_TEXT,
    span_kind=st.sampled_from(["Internal", "Server", "Client"]),
    ts_ns=TS,
    trace_state=FIELD_TEXT,
    event_name=FIELD_TEXT,
    event_attrs=ATTRS,
    span_attrs=ATTRS,
    resource_attrs=ATTRS,
)

# junk: prose, truncations, bad prefixes/hex/ts — must never crash nor emit
JUNK_LINE = st.one_of(
    st.text(alphabet=st.sampled_from(list("OTEL1 trace=spanx0f;%")), max_size=40),
    st.just("OTEL1 "),
    st.just("OTEL1 " + " ".join(["x="] * 10)),
    VALID_LINE.map(lambda ln: ln.replace("ts=", "ts=+", 1)),
    VALID_LINE.map(lambda ln: ln.replace(" span=", " span=zz", 1)),
    VALID_LINE.map(lambda ln: ln[: max(7, len(ln) // 2)]),
)

PAGE_TEXT = st.lists(
    st.one_of(VALID_LINE, JUNK_LINE, st.just("filler prose")), max_size=6
).map("\n".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(PAGE_TEXT, min_size=1, max_size=4))
def test_parse_equals_oracle(texts):
    tbl = pa.Table.from_pylist(
        [
            {"url": f"u{i}", "warc_ts": i, "html": b"", "text": t, "lang": "en"}
            for i, t in enumerate(texts)
        ],
        schema=PAGES_SCHEMA,
    )
    out = parse_pages_batch(tbl)
    got = out.to_pylist()
    import pyarrow.compute as pc

    ts_ns = pc.cast(out.column("event_ts"), pa.int64()).to_pylist()
    exp = [
        ev
        for i, t in enumerate(texts)
        for ev in parse_page(f"u{i}", i, t, "en")
    ]
    assert len(got) == len(exp)
    assert ts_ns == [e.event_ts_ns for e in exp]
    for g, e in zip(got, exp):
        assert g["raw"] == e.raw
        assert g["url"] == e.url
        assert g["event_name"] == e.event_name
        assert g["trace_id"] == e.trace_id
        assert g["span_id"] == e.span_id
        assert g["span_name"] == e.span_name
        assert g["span_kind"] == e.span_kind
        assert g["trace_state"] == e.trace_state
        for col, oracle_attrs in (
            ("event_attrs", e.event_attrs),
            ("span_attrs", e.span_attrs),
            ("resource_attrs", e.resource_attrs),
        ):
            assert g[col] == [(k, f"{t}:{v}") for k, t, v in oracle_attrs], col


OBS = 1_755_000_000_000_000_000

CONFIGS = st.builds(
    lambda inc, isc, laf, sben, al, sa, body, num, txt, en: dataclasses.replace(
        PipelineConfig(
            include_event_names=inc,
            include_span_context=isc,
            log_attributes_from=tuple(laf),
            severity_by_event_name=sben,
            add_level=al,
            severity_attribute=sa,
            attribute_mappings=AttributeMappings(
                body=body, severity_number=num, severity_text=txt, event_name=en
            ),
        ),
        observed_timestamp_ns=OBS,
    ),
    inc=st.sampled_from([(), ("exception",), ("exception", "custom")]),
    isc=st.booleans(),
    laf=st.lists(
        st.sampled_from(
            ["event.attributes", "span.attributes", "resource.attributes"]
        ),
        unique=True,
    ),
    sben=st.dictionaries(
        st.sampled_from(["exception", "custom", "backend", "db", "retry", "s"]),
        st.sampled_from(["error", "warn2", "info", "fatal", "debug3"]),
        max_size=4,
    ),
    al=st.booleans(),
    sa=st.sampled_from(["", "event.severity_text", "k.str"]),
    body=st.sampled_from(["", "event.body", "k.str"]),
    num=st.sampled_from(["", "event.severity_number", "k.int"]),
    txt=st.sampled_from(["", "event.severity_text"]),
    en=st.sampled_from(["", "event.name", "level"]),
)


@settings(max_examples=40, deadline=None)
@given(cfg=CONFIGS, seed=st.integers(0, 30))
def test_enrich_equals_oracle_for_any_config(cfg, seed):
    tbl = generate_pages_table(40, seed=seed)
    pages = [(r["url"], 0, r["text"], r["lang"]) for r in tbl.to_pylist()]
    ev = parse_pages_batch(tbl, tuple(cfg.include_event_names))
    got = enrich_events_batch(ev, cfg).to_pylist()
    exp = run_oracle(pages, cfg)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["severity_number"] == e.severity_number
        assert g["severity_text"] == e.severity_text
        assert g["body"] == e.body
        assert g["attributes"] == list(e.attributes.items())
        assert g["resource_attrs"] == list(e.resource_attrs.items())
        assert g["sink"] == e.sink


@settings(max_examples=60, deadline=None)
@given(st.lists(PAGE_TEXT, min_size=1, max_size=4))
def test_dead_letter_conserves_every_otel_line(texts):
    """Dead-letter conservation law: for ANY input, every 'OTEL1 '-prefixed
    line lands in exactly one of {events, dead-letter} with its bytes
    intact, the audit mode changes nothing about the events output, and
    every rejection reason is from the declared vocabulary."""
    from otelcol_con_spaneventtolog_ray.sources.synth import (
        MALFORMED_REASONS,
    )

    n = len(texts)
    batch = pa.Table.from_arrays(
        [
            pa.array([f"https://t.example/{i}" for i in range(n)], pa.string()),
            pa.array([0] * n, pa.timestamp("us")),
            pa.array([b""] * n, pa.binary()),
            pa.array(texts, pa.large_string()),
            pa.array(["en"] * n, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )
    plain = parse_pages_batch(batch)
    events, dead = parse_pages_batch(batch, collect_malformed=True)
    # audit mode is a pure side-channel: events output identical
    assert events.equals(plain)
    assert set(dead.column("reason").to_pylist()) <= set(MALFORMED_REASONS)
    # per-page conservation, byte-identical lines (multiset equality)
    got: dict[str, list[str]] = {}
    for url, raw in zip(
        events.column("url").to_pylist(), events.column("raw").to_pylist()
    ):
        got.setdefault(url, []).append(raw)
    for url, raw in zip(
        dead.column("url").to_pylist(), dead.column("raw").to_pylist()
    ):
        got.setdefault(url, []).append(raw)
    for i, text in enumerate(texts):
        url = f"https://t.example/{i}"
        want = [ln for ln in text.split("\n") if ln.startswith("OTEL1 ")]
        assert sorted(got.get(url, [])) == sorted(want), url
