"""Pure-Python single-process oracle for tests.

Row-at-a-time literal implementation of the reference semantics
(`/root/reference/spaneventtologconnector/connector.go:189-404`): parse the
OTEL1 event-line grammar out of page text, apply include-filter, severity
precedence, body/attribute projection. Used ONLY by pytest as the golden
model against the vectorized Ray stages — never in the pipeline hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

from .config import PipelineConfig
from .escape import unescape
from .sevmap import map_severity, severity_number_to_text, simple_lower


@dataclass
class OracleEvent:
    url: str
    warc_ts_us: int
    lang: str
    trace_id: bytes
    span_id: bytes
    span_name: str
    span_kind: str
    trace_state: str
    event_name: str
    event_ts_ns: int
    event_attrs: list[tuple[str, str, str]]  # (key, tag, value) in line order
    span_attrs: list[tuple[str, str, str]]
    resource_attrs: list[tuple[str, str, str]]
    raw: str


def parse_attrs(field_str: str) -> list[tuple[str, str, str]]:
    if field_str == "":
        return []
    out = []
    for pair in field_str.split(";"):
        if pair == "" or "=" not in pair:
            continue  # malformed pair -> dropped (matches stages/parse)
        k, _, tv = pair.partition("=")
        # tagged payload is 't:v' by position: first char is the tag, byte 2+
        # the value (degenerate payloads keep these positional semantics)
        out.append((unescape(k), tv[:1], unescape(tv[2:])))
    return out


def parse_page(url: str, warc_ts_us: int, text: str, lang: str) -> list[OracleEvent]:
    """Extract every OTEL1 line from a page's text (byte-identical `raw`)."""
    events = []
    for line in text.split("\n"):
        if not line.startswith("OTEL1 "):
            continue
        toks = line.split(" ")
        if len(toks) != 11:
            continue  # malformed -> dead-letter (counted by the pipeline)
        fields = {}
        ok = True
        for tok, prefix in zip(
            toks[1:],
            ["trace=", "span=", "span_name=", "span_kind=", "ts=", "state=",
             "name=", "attrs=", "sattrs=", "rattrs="],
        ):
            if not tok.startswith(prefix):
                ok = False
                break
            fields[prefix[:-1]] = tok[len(prefix):]
        if not ok:
            continue
        try:
            trace_id = bytes.fromhex(fields["trace"])
            span_id = bytes.fromhex(fields["span"])
        except ValueError:
            continue
        if len(trace_id) != 16 or len(span_id) != 8:
            continue
        # ts grammar = Arrow's string->int64 cast: '-?[0-9]+', int64 range
        # (no '+', whitespace, or unicode digits; see stages/parse fallback)
        ts_str = fields["ts"]
        ts_body = ts_str[1:] if ts_str.startswith("-") else ts_str
        if not (ts_body and ts_body.isascii() and ts_body.isdigit()):
            continue
        ts_ns = int(ts_str)
        if not (-(2**63) <= ts_ns < 2**63):
            continue  # unrepresentable as timestamp[ns] -> dead-letter
        events.append(
            OracleEvent(
                url=url,
                warc_ts_us=warc_ts_us,
                lang=lang,
                trace_id=trace_id,
                span_id=span_id,
                span_name=unescape(fields["span_name"]),
                span_kind=fields["span_kind"],
                trace_state=unescape(fields["state"]),
                event_name=unescape(fields["name"]),
                event_ts_ns=ts_ns,
                event_attrs=parse_attrs(fields["attrs"]),
                span_attrs=parse_attrs(fields["sattrs"]),
                resource_attrs=parse_attrs(fields["rattrs"]),
                raw=line,
            )
        )
    return events


@dataclass
class OracleRecord:
    """One output log record (FIXTURES.md §4) + carried page context."""

    url: str
    timestamp_ns: int
    observed_timestamp_ns: int
    severity_number: int
    severity_text: str
    body: str
    attributes: dict[str, str]  # tagged values "t:v", insertion-ordered
    trace_id: bytes | None
    span_id: bytes | None
    resource_attrs: dict[str, str]
    sink: str = ""
    lang: str = ""
    event_name: str = ""


def severity_class(number: int) -> str:
    """Routing key: base class of the severity number (our sink key)."""
    if 1 <= number <= 24:
        return ["trace", "debug", "info", "warn", "error", "fatal"][(number - 1) // 4]
    return "unspecified"


def _valid_int(s: str) -> bool:
    body = s[1:] if s[:1] == "-" else s
    return bool(
        body and body.isascii() and body.isdigit() and -(2**63) <= int(s) < 2**63
    )


def _get_attr(attrs: list[tuple[str, str, str]], key: str) -> tuple[str, str] | None:
    """pcommon.Map.Get: first entry wins for duplicate keys."""
    for k, tag, v in attrs:
        if k == key:
            return tag, v
    return None


def populate_log_record(cfg: PipelineConfig, ev: OracleEvent) -> OracleRecord:
    """Literal port of populateLogRecord (connector.go:261-404)."""
    severity_number = 9
    severity_text = "info"
    severity_found = False

    am = cfg.attribute_mappings
    # 1. attribute mappings (connector.go:272-296)
    if am.severity_number or am.severity_text:
        if am.severity_number:
            got = _get_attr(ev.event_attrs, am.severity_number)
            if got is not None and got[0] == "i" and _valid_int(got[1]):
                # pinned int grammar ('-?[0-9]+', int64 range) — a malformed
                # 'i:'-payload doesn't fire E1 (matches stages/enrich).
                # plog.SeverityNumber is int32 in the reference, so the
                # assignment WRAPS (Go int64 -> int32 conversion); text and
                # sink derive from the wrapped value (connector.go:276-281)
                severity_number = ((int(got[1]) + 2**31) % 2**32) - 2**31
                severity_text = severity_number_to_text(severity_number)
                severity_found = True
        if am.severity_text:
            got = _get_attr(ev.event_attrs, am.severity_text)
            if got is not None and got[0] == "s":
                severity_text = got[1]  # raw text kept
                if not severity_found:
                    pn, pt = map_severity(severity_text)
                    if pn != 0:
                        severity_number = pn
                        severity_text = pt  # canonicalized
                severity_found = True  # fires even if unparseable
    # 2. severity_attribute (connector.go:300-309)
    if not severity_found and cfg.severity_attribute:
        got = _get_attr(ev.event_attrs, cfg.severity_attribute)
        if got is not None and got[0] == "s":
            pn, pt = map_severity(got[1])
            if pn != 0:
                severity_number, severity_text = pn, pt
                severity_found = True
    # 3. severity_by_event_name longest-substring (connector.go:312-335),
    # deterministic tiebreak: lexicographic-smallest lowercased key
    if not severity_found and cfg.severity_by_event_name:
        lower_name = simple_lower(ev.event_name)  # Go simple mapping, not str.lower
        for lower_key, num, txt in cfg.sorted_event_name_rules():
            if lower_key in lower_name:
                severity_number, severity_text = num, txt
                severity_found = True
                break

    # body (connector.go:348-358)
    body = ev.event_name
    if am.body:
        got = _get_attr(ev.event_attrs, am.body)
        if got is not None and got[0] == "s":
            body = got[1]

    # attributes build order (connector.go:361-403); tagged "t:v" values,
    # PutStr-on-existing-key keeps first position but takes the new value
    attributes: dict[str, str] = {}
    if cfg.should_copy_attributes("event.attributes"):
        for k, tag, v in ev.event_attrs:
            if k not in attributes:  # CopyTo of a Map keeps first occurrence
                attributes[k] = f"{tag}:{v}"
    if am.event_name:
        attributes[am.event_name] = f"s:{ev.event_name}"
    if cfg.add_level and "level" not in attributes:
        attributes["level"] = f"s:{severity_text}"
    if cfg.should_copy_attributes("span.attributes"):
        for k, tag, v in ev.span_attrs:
            attributes[k] = f"{tag}:{v}"  # overwrite, keep first position
    trace_id = span_id = None
    if cfg.include_span_context:
        trace_id, span_id = ev.trace_id, ev.span_id
        if ev.trace_state != "":
            attributes["trace.state"] = f"s:{ev.trace_state}"
        attributes["span.name"] = f"s:{ev.span_name}"
        attributes["span.kind"] = f"s:{ev.span_kind}"

    resource_attrs: dict[str, str] = {}
    if cfg.should_copy_attributes("resource.attributes"):
        for k, tag, v in ev.resource_attrs:
            if k not in resource_attrs:
                resource_attrs[k] = f"{tag}:{v}"

    return OracleRecord(
        url=ev.url,
        timestamp_ns=ev.event_ts_ns,
        observed_timestamp_ns=cfg.observed_timestamp_ns or 0,
        severity_number=severity_number,
        severity_text=severity_text,
        body=body,
        attributes=attributes,
        trace_id=trace_id,
        span_id=span_id,
        resource_attrs=resource_attrs,
        sink=severity_class(severity_number),
        lang=ev.lang,
        event_name=ev.event_name,
    )


def run_oracle(
    pages: list[tuple[str, int, str, str]], cfg: PipelineConfig
) -> list[OracleRecord]:
    """pages as (url, warc_ts_us, text, lang) -> filtered, populated records."""
    include = set(cfg.include_event_names)
    out = []
    for url, ts, text, lang in pages:
        for ev in parse_page(url, ts, text, lang):
            if include and ev.event_name not in include:
                continue
            out.append(populate_log_record(cfg, ev))
    return out
