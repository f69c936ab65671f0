"""Table-driven enrich semantics — ports of TestTracingInstrumentationIntegration,
TestNoEmptyLogsWhenNoMatchingEvents, TestAttributeMappings (6 cases) and
TestAttributeMappingsPrecedence (connector_test.go:27-58, 238-443), run over
fixture pages A/B through the real parse+enrich stages, plus randomized
oracle-equivalence including attribute-collision configs."""

import dataclasses

import pyarrow as pa
import pytest

from otelcol_con_spaneventtolog_ray.config import AttributeMappings, PipelineConfig
from otelcol_con_spaneventtolog_ray.oracle import run_oracle
from otelcol_con_spaneventtolog_ray.sources.synth import (
    PAGES_SCHEMA,
    build_line,
    fixture_a_lines,
    fixture_b_lines,
    generate_pages_table,
)
from otelcol_con_spaneventtolog_ray.stages.enrich import enrich_events_batch
from otelcol_con_spaneventtolog_ray.stages.parse import parse_pages_batch

OBS = 1_755_000_000_000_000_000


def _pages(lines):
    return pa.Table.from_pylist(
        [
            {
                "url": "https://test.example/00000000",
                "warc_ts": 0,
                "html": b"",
                "text": "prose\n" + "\n".join(lines) + "\nmore prose",
                "lang": "en",
            }
        ],
        schema=PAGES_SCHEMA,
    )


def _run(cfg, lines):
    cfg = dataclasses.replace(cfg, observed_timestamp_ns=OBS)
    ev = parse_pages_batch(_pages(lines), tuple(cfg.include_event_names))
    return enrich_events_batch(ev, cfg).to_pylist()


def test_integration_two_events():
    # connector_test.go:27-58
    cfg = PipelineConfig(
        include_span_context=True,
        log_attributes_from=("event.attributes",),
        severity_by_event_name={"exception": "error"},
    )
    recs = _run(cfg, fixture_a_lines())
    assert len(recs) == 2
    exc, cus = recs
    assert exc["severity_number"] == 17 and exc["severity_text"] == "error"
    assert cus["severity_number"] == 9 and cus["severity_text"] == "info"
    assert exc["body"] == "exception" and cus["body"] == "custom"
    attrs = dict(exc["attributes"])
    assert attrs["exception.type"] == "s:NullPointerException"
    assert attrs["span.name"] == "s:test-span"
    assert attrs["span.kind"] == "s:Server"
    assert exc["trace_id"] == bytes(range(1, 17))
    assert exc["span_id"] == bytes(range(1, 9))
    assert exc["sink"] == "error" and cus["sink"] == "info"


def test_no_records_when_filter_never_matches():
    # connector_test.go:238-261
    cfg = PipelineConfig(include_event_names=("nonexistent_event",))
    assert _run(cfg, fixture_a_lines()) == []


ATTR_MAPPING_CASES = [
    # (name, mappings, severity_by_event_name, expected body/sevnum/sevtext, event.name attr?)
    (
        "complete",
        AttributeMappings(body="event.body", severity_number="event.severity_number",
                          severity_text="event.severity_text", event_name="event.name"),
        {},
        ("Successfully wrote TODO 5770916c-3838-4443-b4a8-f2b90366e235 to DynamoDB",
         9, "INFO"), True,
    ),
    (
        "partial-fallback",
        AttributeMappings(body="event.body", event_name="event.name"),
        {"backend": "info"},
        ("Successfully wrote TODO 5770916c-3838-4443-b4a8-f2b90366e235 to DynamoDB",
         9, "info"), True,
    ),
    (
        "missing-body-fallback",
        AttributeMappings(body="missing.attribute", severity_number="event.severity_number",
                          severity_text="event.severity_text"),
        {},
        ("backend.db.write_item.success", 9, "INFO"), False,
    ),
    (
        "no-mappings-default",
        AttributeMappings(),
        {},
        ("backend.db.write_item.success", 9, "info"), False,
    ),
    (
        "text-only-parsed-canonical",
        AttributeMappings(severity_text="event.severity_text"),
        {},
        ("backend.db.write_item.success", 9, "info"), False,
    ),
    (
        "number-only-derived-text",
        AttributeMappings(severity_number="event.severity_number"),
        {},
        ("backend.db.write_item.success", 9, "info"), False,
    ),
]


@pytest.mark.parametrize("name,am,sben,expected,has_en", ATTR_MAPPING_CASES,
                         ids=[c[0] for c in ATTR_MAPPING_CASES])
def test_attribute_mappings(name, am, sben, expected, has_en):
    # connector_test.go:264-402
    cfg = PipelineConfig(
        log_attributes_from=("event.attributes",),
        attribute_mappings=am,
        severity_by_event_name=sben,
    )
    recs = _run(cfg, fixture_b_lines())
    assert len(recs) == 1
    r = recs[0]
    body, num, txt = expected
    assert r["body"] == body
    assert r["severity_number"] == num
    assert r["severity_text"] == txt
    attrs = dict(r["attributes"])
    if has_en:
        assert attrs.get("event.name") == "s:backend.db.write_item.success"
    else:
        assert "event.name" not in attrs


def test_attribute_mappings_precedence():
    # connector_test.go:405-443: mappings beat severity_attribute and
    # severity_by_event_name; raw "INFO" text kept because E1 fired
    cfg = PipelineConfig(
        log_attributes_from=("event.attributes",),
        severity_attribute="some.other.attribute",
        severity_by_event_name={"backend": "error"},
        attribute_mappings=AttributeMappings(
            severity_number="event.severity_number", severity_text="event.severity_text"
        ),
    )
    recs = _run(cfg, fixture_b_lines())
    assert len(recs) == 1
    assert recs[0]["severity_number"] == 9
    assert recs[0]["severity_text"] == "INFO"


def test_unparseable_severity_text_blocks_fallbacks():
    # E2 sticky raw text (connector.go:283-296): fires even when unparseable,
    # suppressing severity_attribute and severity_by_event_name
    line = build_line(
        trace_hex32="00" * 16, span_hex16="00" * 8, span_name="s", span_kind="Client",
        ts_ns=1, trace_state="", event_name="exception",
        event_attrs=[("sev.text", "s", "NOTASEVERITY"), ("sev.attr", "s", "fatal")],
        span_attrs=[], resource_attrs=[],
    )
    cfg = PipelineConfig(
        severity_attribute="sev.attr",
        severity_by_event_name={"exception": "error"},
        attribute_mappings=AttributeMappings(severity_text="sev.text"),
    )
    recs = _run(cfg, [line])
    assert recs[0]["severity_text"] == "NOTASEVERITY"
    assert recs[0]["severity_number"] == 9  # default stays


def test_int_typed_requirement_for_severity_number():
    # a STRING "9" must not fire the severity_number mapping (connector.go:275-276)
    line = build_line(
        trace_hex32="00" * 16, span_hex16="00" * 8, span_name="s", span_kind="Client",
        ts_ns=1, trace_state="", event_name="e",
        event_attrs=[("sn", "s", "21")], span_attrs=[], resource_attrs=[],
    )
    cfg = PipelineConfig(attribute_mappings=AttributeMappings(severity_number="sn"))
    recs = _run(cfg, [line])
    assert recs[0]["severity_number"] == 9 and recs[0]["severity_text"] == "info"


def test_add_level_and_collisions():
    # level only added when absent; span attrs overwrite event attrs at first
    # position (connector.go:371-386)
    line = build_line(
        trace_hex32="00" * 16, span_hex16="00" * 8, span_name="sp", span_kind="Server",
        ts_ns=1, trace_state="ts=1", event_name="exception",
        event_attrs=[("level", "s", "preexisting"), ("shared", "s", "fromevent")],
        span_attrs=[("shared", "s", "fromspan"), ("sonly", "i", "7")],
        resource_attrs=[],
    )
    cfg = PipelineConfig(
        include_span_context=True,
        log_attributes_from=("event.attributes", "span.attributes"),
        add_level=True,
        severity_by_event_name={"exception": "error"},
    )
    recs = _run(cfg, [line])
    attrs = recs[0]["attributes"]
    # insertion order: event attrs first, shared overwritten in place by span
    assert attrs == [
        ("level", "s:preexisting"),
        ("shared", "s:fromspan"),
        ("sonly", "i:7"),
        ("trace.state", "s:ts=1"),
        ("span.name", "s:sp"),
        ("span.kind", "s:Server"),
    ]


def test_add_level_when_absent():
    line = build_line(
        trace_hex32="00" * 16, span_hex16="00" * 8, span_name="sp", span_kind="Server",
        ts_ns=1, trace_state="", event_name="exception",
        event_attrs=[("a", "s", "b")], span_attrs=[], resource_attrs=[],
    )
    cfg = PipelineConfig(
        log_attributes_from=("event.attributes",),
        add_level=True,
        severity_by_event_name={"exception": "error"},
    )
    attrs = _run(cfg, [line])[0]["attributes"]
    assert attrs == [("a", "s:b"), ("level", "s:error")]


def test_longest_substring_rule_wins():
    line = build_line(
        trace_hex32="00" * 16, span_hex16="00" * 8, span_name="s", span_kind="Client",
        ts_ns=1, trace_state="", event_name="backend.db.write_item.success",
        event_attrs=[], span_attrs=[], resource_attrs=[],
    )
    cfg = PipelineConfig(
        severity_by_event_name={"backend": "warn", "backend.db": "fatal", "db": "debug"}
    )
    recs = _run(cfg, [line])
    assert recs[0]["severity_text"] == "fatal"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_oracle_equivalence_randomized(seed):
    tbl = generate_pages_table(250, seed=seed)
    pages = [(r["url"], 0, r["text"], r["lang"]) for r in tbl.to_pylist()]
    cfg = dataclasses.replace(
        PipelineConfig(
            include_span_context=(seed % 2 == 0),
            log_attributes_from=("event.attributes", "span.attributes",
                                 "resource.attributes"),
            severity_by_event_name={"exception": "error", "custom": "debug2",
                                    "backend": "warn"},
            add_level=True,
            severity_attribute="event.severity_text" if seed == 2 else "",
            attribute_mappings=AttributeMappings(
                body="event.body" if seed == 1 else "",
                severity_number="event.severity_number" if seed != 3 else "",
                severity_text="event.severity_text" if seed == 3 else "",
                event_name="event.name",
            ),
        ),
        observed_timestamp_ns=OBS,
    )
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
        assert g["trace_id"] == e.trace_id and g["span_id"] == e.span_id
        assert g["sink"] == e.sink


def test_severity_number_malformed_int_payload_falls_through():
    """A non-integer 'i:'-tagged payload must NOT fire E1 — in both the
    vectorized stage and the oracle (pinned '-?[0-9]+' int64 grammar)."""
    for payload in ("3.7", "1e3", "9_0", "+5", "", "99999999999999999999"):
        line = build_line(
            trace_hex32="00" * 16, span_hex16="00" * 8, span_name="s",
            span_kind="Client", ts_ns=1, trace_state="", event_name="evt",
            event_attrs=[("sev", "i", payload)], span_attrs=[],
            resource_attrs=[],
        )
        cfg = PipelineConfig(
            attribute_mappings=AttributeMappings(severity_number="sev"),
            log_attributes_from=("event.attributes",),
        )
        recs = _run(cfg, [line])
        assert recs[0]["severity_number"] == 9, payload  # default, E1 skipped
        tbl = _pages([line])
        pages = [(r["url"], 0, r["text"], r["lang"]) for r in tbl.to_pylist()]
        exp = run_oracle(pages, dataclasses.replace(cfg, observed_timestamp_ns=OBS))
        assert exp[0].severity_number == 9, payload


def test_severity_number_int32_wrap_parity():
    """E1 assigns through an int32 (plog.SeverityNumber) like the reference:
    out-of-int32-range 'i:' payloads wrap, and text AND sink derive from the
    wrapped value — identically in the stage and the golden model."""
    from otelcol_con_spaneventtolog_ray.oracle import severity_class

    cases = [
        ("4294967305", 9, "info"),       # 2^32 + 9  -> 9
        ("4294967301", 5, "debug"),      # 2^32 + 5  -> 5
        ("-4294967291", 5, "debug"),     # -(2^32)+5 -> 5
        ("2147483648", -2147483648, "info"),  # int32 min after wrap
        ("17", 17, "error"),
    ]
    for payload, want_num, want_txt in cases:
        line = build_line(
            trace_hex32="00" * 16, span_hex16="00" * 8, span_name="s",
            span_kind="Client", ts_ns=1, trace_state="", event_name="evt",
            event_attrs=[("sev", "i", payload)], span_attrs=[],
            resource_attrs=[],
        )
        cfg = PipelineConfig(
            attribute_mappings=AttributeMappings(severity_number="sev"),
            log_attributes_from=("event.attributes",),
        )
        recs = _run(cfg, [line])
        assert recs[0]["severity_number"] == want_num, payload
        assert recs[0]["severity_text"] == want_txt, payload
        assert recs[0]["sink"] == severity_class(want_num), payload
        tbl = _pages([line])
        pages = [(r["url"], 0, r["text"], r["lang"]) for r in tbl.to_pylist()]
        exp = run_oracle(pages, dataclasses.replace(cfg, observed_timestamp_ns=OBS))
        assert exp[0].severity_number == want_num, payload
        assert exp[0].severity_text == want_txt, payload
        assert exp[0].sink == recs[0]["sink"], payload


def test_nested_map_slice_values_round_trip_and_collide():
    """Nested map/slice attr values (reference connector.go:382-385,
    pcommon.Value Map/Slice copy path): the once-more-escaped rendering
    survives parse byte-exactly, decodes back to the original pairs, and
    participates in D4/D7 collision semantics (first-insertion position,
    span-attr last-writer value) as an opaque tagged payload — identically
    in the stage and the golden model."""
    from otelcol_con_spaneventtolog_ray.nested import (
        decode_list,
        decode_map,
        encode_list,
        encode_map,
    )

    inner = [("depth", "i", "2"), ("note", "s", "a;b=c %20 d"),
             ("deep", "m", encode_map([("x", "s", "y;=")]))]  # two levels
    items = [("s", "it;em"), ("i", "42"), ("l", encode_list([("s", "in")]))]
    ev_map = encode_map(inner)
    sp_map = encode_map([("depth", "i", "9")])
    line = build_line(
        trace_hex32="00" * 16, span_hex16="00" * 8, span_name="s",
        span_kind="Client", ts_ns=1, trace_state="", event_name="evt",
        event_attrs=[("ctx", "m", ev_map), ("tags", "l", encode_list(items)),
                     ("plain", "s", "keep")],
        span_attrs=[("ctx", "m", sp_map)],  # collides with event attr 'ctx'
        resource_attrs=[],
    )
    cfg = PipelineConfig(
        log_attributes_from=("event.attributes", "span.attributes"),
    )
    recs = _run(cfg, [line])
    attrs = dict(recs[0]["attributes"])
    # D7: span attr wins the VALUE, event attr keeps the POSITION (first)
    assert [k for k, _ in recs[0]["attributes"]] == ["ctx", "tags", "plain"]
    assert attrs["ctx"] == f"m:{sp_map}"
    assert attrs["tags"].startswith("l:")
    # round-trip: stored payload decodes to the original nested pairs
    assert decode_map(attrs["ctx"][2:]) == [("depth", "i", "9")]
    assert decode_list(attrs["tags"][2:]) == items
    # two-level nesting survives
    ev_only = _run(
        PipelineConfig(log_attributes_from=("event.attributes",)), [line]
    )
    ev_attrs = dict(ev_only[0]["attributes"])
    got_inner = decode_map(ev_attrs["ctx"][2:])
    assert got_inner == inner
    assert decode_map(got_inner[2][2]) == [("x", "s", "y;=")]
    # oracle parity
    tbl = _pages([line])
    pages = [(r["url"], 0, r["text"], r["lang"]) for r in tbl.to_pylist()]
    exp = run_oracle(pages, dataclasses.replace(cfg, observed_timestamp_ns=OBS))
    assert list(exp[0].attributes.items()) == recs[0]["attributes"]
