"""Deterministic synthetic pages sources (FIXTURES.md §1-§2, §5, §7).

Two generators, both seed/arithmetic-deterministic and free of wall clock:

* :func:`generate_pages_table` — standalone pages table for pytest tiers
  (``t_unit`` fixture pages A/B verbatim, ``t_small`` skewed distribution with
  escape-exercising attribute values).
* :func:`embed_docs_batch` — derives pages from the driver's ``documents``
  parquet via pure ``doc_id`` arithmetic, so a DuckDB SQL oracle can reproduce
  the embedded event lines (and hence routed rows / per-sink counts) exactly.
  This is what ``__ray_entry__.queries()`` pipelines read.

Event-line grammar (one line inside the page ``text``):

    OTEL1 trace=<32hex> span=<16hex> span_name=<esc> span_kind=<Kind>
          ts=<ns int> state=<esc> name=<esc> attrs=<p> sattrs=<p> rattrs=<p>

(single spaces; ``<p>`` is ``key=t:value`` pairs ';'-joined, ``t`` in
{s,i,d,b,y,m,l} — see nested.py: ``m``/``l`` payloads are once-more-escaped
nested map/list renderings, mirroring the reference's pcommon.Value
Map/Slice copy path; '%'/' '/'='/';'/newline percent-escaped in names and
values so the line splits unambiguously on spaces). Extraction must
round-trip the matched line byte-identically per url (BASELINE.json
input_hint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..escape import escape

SPAN_KINDS = ["Internal", "Server", "Client", "Producer", "Consumer"]

BASE_WARC_TS_US = 1751241600000000  # 2025-06-30T00:00:00Z in µs
BASE_EVENT_TS_NS = 1750000000000000000

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def format_attrs(attrs: list[tuple[str, str, str]]) -> str:
    """attrs as [(key, tag, value_str)] -> escaped 'k=t:v;k=t:v' rendering."""
    return ";".join(f"{escape(k)}={t}:{escape(v)}" for k, t, v in attrs)


def build_line(
    trace_hex32: str,
    span_hex16: str,
    span_name: str,
    span_kind: str,
    ts_ns: int,
    trace_state: str,
    event_name: str,
    event_attrs: list[tuple[str, str, str]],
    span_attrs: list[tuple[str, str, str]],
    resource_attrs: list[tuple[str, str, str]],
) -> str:
    return (
        f"OTEL1 trace={trace_hex32} span={span_hex16}"
        f" span_name={escape(span_name)} span_kind={span_kind}"
        f" ts={ts_ns} state={escape(trace_state)} name={escape(event_name)}"
        f" attrs={format_attrs(event_attrs)}"
        f" sattrs={format_attrs(span_attrs)}"
        f" rattrs={format_attrs(resource_attrs)}"
    )


# ---------------------------------------------------------------------------
# Fixture pages A / B — verbatim ports of the reference test fixtures
# (connector_test.go:186-225 and 446-476, timestamps frozen).
# ---------------------------------------------------------------------------

_FIX_TRACE = "0102030405060708090a0b0c0d0e0f10"
_FIX_SPAN = "0102030405060708"
_FIX_SPAN_ATTRS = [("http.method", "s", "GET"), ("http.url", "s", "https://example.com")]
_FIX_RES_ATTRS = [("service.name", "s", "test-service")]


def fixture_a_lines() -> list[str]:
    """createTestTraces: 2 events ('exception' + 'custom') on one Server span."""
    common = dict(
        trace_hex32=_FIX_TRACE,
        span_hex16=_FIX_SPAN,
        span_name="test-span",
        span_kind="Server",
        trace_state="",
        span_attrs=_FIX_SPAN_ATTRS,
        resource_attrs=_FIX_RES_ATTRS,
    )
    return [
        build_line(
            ts_ns=BASE_EVENT_TS_NS - 30_000_000_000,
            event_name="exception",
            event_attrs=[
                ("exception.type", "s", "NullPointerException"),
                ("exception.message", "s", "Object was null"),
                ("exception.stacktrace", "s", "at com.example.Test.method(Test.java:42)"),
            ],
            **common,
        ),
        build_line(
            ts_ns=BASE_EVENT_TS_NS - 15_000_000_000,
            event_name="custom",
            event_attrs=[("custom.key", "s", "custom value"), ("custom.count", "i", "42")],
            **common,
        ),
    ]


def fixture_b_lines() -> list[str]:
    """createTestTracesWithStructuredEvent: one structured event."""
    return [
        build_line(
            trace_hex32=_FIX_TRACE,
            span_hex16=_FIX_SPAN,
            span_name="test-span",
            span_kind="Server",
            ts_ns=BASE_EVENT_TS_NS - 30_000_000_000,
            trace_state="",
            event_name="backend.db.write_item.success",
            event_attrs=[
                (
                    "event.body",
                    "s",
                    "Successfully wrote TODO 5770916c-3838-4443-b4a8-f2b90366e235 to DynamoDB",
                ),
                ("event.severity_number", "i", "9"),
                ("event.severity_text", "s", "INFO"),
            ],
            span_attrs=_FIX_SPAN_ATTRS,
            resource_attrs=_FIX_RES_ATTRS,
        )
    ]


_FILLER_WORDS = np.array(
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua".split(),
    dtype=object,
)


def _cycle_lang(url_i: int) -> str:
    return ["en", "de", "fr", "es"][url_i % 4]


def _page(url_i: int, lines: list[str], lang: str, rng: np.random.Generator | None) -> dict:
    filler = (
        " ".join(rng.choice(_FILLER_WORDS, size=int(rng.integers(3, 12))))
        if rng is not None
        else "filler prose line"
    )
    # interleave: filler, then each event line separated by more filler
    parts = [filler]
    for ln in lines:
        parts.append(ln)
        parts.append(filler)
    return {
        "url": f"https://test.example/{url_i:08d}",
        "warc_ts": BASE_WARC_TS_US + url_i * 1_000_000,
        "html": b"<html><body>filler</body></html>",
        "text": "\n".join(parts),
        "lang": lang,
    }


# skewed event-name distribution for t_small: hot key 'exception'
_SMALL_NAMES = [
    "exception",
    "exception",
    "exception",
    "exception",
    "custom",
    "backend.db.write_item.success",
    "request.retry",
    "cache.miss error=hot",  # name with escaped chars
    "weird;name=x",  # forces %3B / %3D escaping in name
]


def generate_pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    """t_small-style deterministic pages table; first two pages are fixtures A/B."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_pages):
        if i == 0:
            rows.append(_page(i, fixture_a_lines(), _cycle_lang(i), rng))
            continue
        if i == 1:
            rows.append(_page(i, fixture_b_lines(), _cycle_lang(i), rng))
            continue
        n_ev = int(rng.integers(0, 9))
        lines = []
        for j in range(n_ev):
            name = _SMALL_NAMES[int(rng.integers(0, len(_SMALL_NAMES)))]
            attrs: list[tuple[str, str, str]] = [
                ("k.str", "s", f"v {i}-{j};=%"),  # escape-exercising value
                ("k.int", "i", str(int(rng.integers(0, 1000)))),
            ]
            if j % 3 == 0:  # nested map value (escape-exercising inner v)
                from ..nested import encode_map

                attrs.append(
                    ("k.map", "m", encode_map(
                        [("depth", "i", str(j)), ("note", "s", f"n;= {i}%")]
                    ))
                )
            if j % 4 == 1:  # nested list/slice value
                from ..nested import encode_list

                attrs.append(
                    ("k.list", "l", encode_list(
                        [("s", f"item {j};"), ("i", str(i))]
                    ))
                )
            if name == "backend.db.write_item.success":
                attrs += [
                    ("event.severity_number", "i", str(int(rng.integers(0, 30)))),
                    ("event.severity_text", "s", ["INFO", "WARN", "bogus"][j % 3]),
                    ("event.body", "s", f"body {i}/{j}"),
                ]
            lines.append(
                build_line(
                    trace_hex32=f"{i:032x}",
                    span_hex16=f"{(i * 16 + j) % (1 << 63):016x}",
                    span_name=f"span-{i % 10}",
                    span_kind=SPAN_KINDS[i % 5],
                    ts_ns=BASE_EVENT_TS_NS + i * 1_000_000 + j * 1_000,
                    trace_state="congo=t61rcWkgMzE" if i % 10 == 0 else "",
                    event_name=name,
                    event_attrs=attrs,
                    span_attrs=[("http.method", "s", ["GET", "POST", "PUT"][i % 3])],
                    resource_attrs=[("service.name", "s", f"svc-{i % 4}")],
                )
            )
        rows.append(_page(i, lines, _cycle_lang(i), rng))
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# documents -> pages embedding (SQL-mirrorable; see __ray_entry__.oracle_sql)
# ---------------------------------------------------------------------------

EMBED_EVENT_NAMES = [
    "exception",
    "custom",
    "backend.db.write_item.success",
    "request.retry",
    "cache.miss",
]
EMBED_SEV_TEXTS = ["INFO", "WARN", "ERROR", "DEBUG", "TRACE", "FATAL", "bogus", "warning2"]


def embed_lines_for_doc(doc_id: int) -> list[str]:
    """Event lines for one document — pure doc_id arithmetic (SQL-mirrorable)."""
    lines = []
    for j in range(doc_id % 4):
        k = (doc_id + j) % 5
        name = EMBED_EVENT_NAMES[k]
        if k == 0:
            attrs = f"exception.type=s:Err{doc_id % 7};exception.message=s:msg_{doc_id % 13}"
        elif k == 1:
            attrs = f"custom.key=s:val_{doc_id % 11};custom.count=i:{doc_id % 100}"
        elif k == 2:
            attrs = (
                f"event.body=s:wrote_item_{doc_id}"
                f";event.severity_number=i:{doc_id % 30}"
                f";event.severity_text=s:{EMBED_SEV_TEXTS[doc_id % 8]}"
            )
        elif k == 3:
            attrs = f"retry.count=i:{j};retry.reason=s:timeout_{doc_id % 3}"
        else:
            attrs = ""
        state = "congo%3Dt61rcWkgMzE" if doc_id % 10 == 0 else ""
        lines.append(
            f"OTEL1 trace={doc_id:032x} span={doc_id * 8 + j:016x}"
            f" span_name=span-{doc_id % 10} span_kind={SPAN_KINDS[doc_id % 5]}"
            f" ts={BASE_EVENT_TS_NS + doc_id * 1_000_000 + j * 1_000}"
            f" state={state} name={name}"
            f" attrs={attrs}"
            f" sattrs=http.method=s:{['GET', 'POST', 'PUT'][doc_id % 3]}"
            f";http.status_code=i:{200 + (doc_id % 5) * 100}"
            f" rattrs=service.name=s:svc-{doc_id % 4}"
        )
    return lines


def embed_nested_pages_batch(batch: pa.Table) -> pa.Table:
    """documents -> pages where each doc carries ONE event line with a
    nested map attr (``ctx=m:...``) and a nested list attr (``tags=l:...``)
    derived from pure doc_id arithmetic, so a DuckDB oracle reproduces the
    decoded nested fields exactly (pipeline_nested_attr)."""
    from ..escape import escape

    doc_ids = batch.column("doc_id").to_numpy()
    langs = batch.column("lang").to_pylist()
    urls, warc, html, out_texts = [], [], [], []
    for doc_id, lang in zip(doc_ids, langs):
        doc_id = int(doc_id)
        nested_map = f"retries=i:{doc_id % 5};host=s:h{doc_id % 3}"
        nested_list = f"s:t{doc_id % 2};i:{doc_id % 7}"
        line = (
            f"OTEL1 trace={doc_id:032x} span={doc_id:016x}"
            f" span_name=s span_kind=Internal"
            f" ts={BASE_EVENT_TS_NS + doc_id} state= name=nested.evt"
            f" attrs=ctx=m:{escape(nested_map)};tags=l:{escape(nested_list)}"
            f" sattrs= rattrs="
        )
        urls.append(f"https://docs.example/{doc_id:08d}")
        warc.append(BASE_WARC_TS_US + doc_id * 1_000_000)
        html.append(b"<html/>")
        out_texts.append(line)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(warc, pa.timestamp("us")),
            pa.array(html, pa.binary()),
            pa.array(out_texts, pa.large_string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def embed_docs_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents(doc_id, text, lang, ...) -> pages table.

    Generation stage only (not the graded hot path); the per-row loop builds
    ~1.5 short lines per doc. ``doc_id`` may exceed the raw table's ids when
    the bench replicates input (replica r adds r * 10_000_000).
    """
    doc_ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls, warc, html, out_texts = [], [], [], []
    for doc_id, text, _lang in zip(doc_ids, texts, langs):
        doc_id = int(doc_id)
        urls.append(f"https://docs.example/{doc_id:08d}")
        warc.append(BASE_WARC_TS_US + doc_id * 1_000_000)
        html.append(b"<html/>")
        out_texts.append("\n".join([text] + embed_lines_for_doc(doc_id)))
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(warc, pa.timestamp("us")),
            pa.array(html, pa.binary()),
            pa.array(out_texts, pa.large_string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


# ---------------------------------------------------------------------------
# dead-letter fixture: poison-pill malformed OTEL1 lines (SURVEY §4 — parse
# failures must not kill the job and must stay auditable; reference analog:
# the connector silently skips events it cannot convert, this repo keeps
# them in a (url, raw, reason) side channel instead)
# ---------------------------------------------------------------------------

MALFORMED_REASONS = ("bad_token_count", "bad_field_or_ts", "bad_hex")


def malformed_line_for_doc(doc_id: int) -> str | None:
    """Deterministic poison-pill OTEL1 line for doc_id % 6 == 0 pages
    (None otherwise). The kind cycles ``(doc_id // 6) % 3`` over the parse
    stage's three validity gates: 0 -> wrong token count, 1 -> non-integer
    ts, 2 -> non-hex trace id. Pure arithmetic so the DuckDB oracle
    reproduces line AND rejection reason exactly."""
    if doc_id % 6 != 0:
        return None
    kind = (doc_id // 6) % 3
    if kind == 0:
        return f"OTEL1 trace={doc_id:032x}"
    if kind == 1:
        return (
            f"OTEL1 trace={doc_id:032x} span={doc_id:016x}"
            " span_name=span-bad span_kind=Internal ts=xx state="
            " name=poison attrs= sattrs= rattrs="
        )
    return (
        "OTEL1 trace=" + "z" * 32 + f" span={doc_id:016x}"
        f" span_name=span-bad span_kind=Internal"
        f" ts={BASE_EVENT_TS_NS + doc_id} state="
        " name=poison attrs= sattrs= rattrs="
    )


def embed_docs_malformed_batch(batch: pa.Table) -> pa.Table:
    """:func:`embed_docs_batch` variant planting one deterministic malformed
    OTEL1 line on every doc_id % 6 == 0 page — the dead-letter audit
    fixture read by ``pipeline_dead_letter``."""
    pages = embed_docs_batch(batch)
    doc_ids = batch.column("doc_id").to_numpy()
    texts = pages.column("text").to_pylist()
    out = []
    for doc_id, text in zip(doc_ids, texts):
        bad = malformed_line_for_doc(int(doc_id))
        out.append(text if bad is None else text + "\n" + bad)
    return pages.set_column(
        3, "text", pa.array(out, pa.large_string())
    )
