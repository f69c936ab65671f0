"""Vectorized parse/extract stage (SURVEY.md §2 op B + filter C).

Generalizes the reference's nested-loop span-event extraction
(`connector.go:189-258`) into a flat-map `map_batches` transform over
zero-copy Arrow string columns: page text -> one row per embedded OTEL1
event line, schema per FIXTURES.md §3. Everything is pyarrow.compute /
numpy kernels — no per-row Python in the hot path. The matched line is
carried verbatim in `raw` (byte-identical extraction invariant).

Malformed lines (wrong token count / field prefixes / hex widths / non-int
timestamp) are dropped from the events output and counted in the `_malformed`
sidecar column of the page-level stats (dead-letter semantics, SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..escape import unescape_array

EVENT_FIELD_PREFIXES = [
    "trace=", "span=", "span_name=", "span_kind=", "ts=",
    "state=", "name=", "attrs=", "sattrs=", "rattrs=",
]

EVENTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("trace_id", pa.binary(16)),
        ("span_id", pa.binary(8)),
        ("span_name", pa.string()),
        ("span_kind", pa.string()),
        ("trace_state", pa.string()),
        ("event_name", pa.string()),
        ("event_ts", pa.timestamp("ns")),
        ("event_attrs", pa.map_(pa.string(), pa.string())),
        ("span_attrs", pa.map_(pa.string(), pa.string())),
        ("resource_attrs", pa.map_(pa.string(), pa.string())),
        ("raw", pa.large_string()),
    ]
)

# hex char -> nibble lookup; 255 marks invalid
_HEX_LUT = np.full(256, 255, dtype=np.uint8)
for _c in b"0123456789":
    _HEX_LUT[_c] = _c - ord("0")
for _c in b"abcdef":
    _HEX_LUT[_c] = _c - ord("a") + 10
for _c in b"ABCDEF":
    _HEX_LUT[_c] = _c - ord("A") + 10


def _string_array_np_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) numpy views over a (large_)string array's buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offsets.astype(np.int64, copy=False), data


def hex_to_fixed_binary(arr: pa.Array, nbytes: int) -> tuple[pa.Array, np.ndarray]:
    """Decode fixed-width hex strings -> fixed_size_binary(nbytes).

    Returns (binary array, valid mask). Caller must have verified lengths
    == 2*nbytes. Fully vectorized via a char lookup table.
    """
    n = len(arr)
    if n == 0:
        return pa.array([], pa.binary(nbytes)), np.zeros(0, dtype=bool)
    offsets, data = _string_array_np_view(arr)
    width = 2 * nbytes
    if offsets[0] == 0 and offsets[-1] == n * width and len(data) >= n * width:
        # compacted array of uniform-width strings: reshape, no gather
        chars = data[: n * width].reshape(n, width)
    else:
        chars = data[offsets[:-1, None] + np.arange(width)]
    nibbles = _HEX_LUT[chars]
    valid = ~(nibbles == 255).any(axis=1)
    packed = ((nibbles[:, 0::2] << 4) | (nibbles[:, 1::2] & 0x0F)).astype(np.uint8)
    out = pa.Array.from_buffers(
        pa.binary(nbytes), n, [None, pa.py_buffer(packed.tobytes())]
    )
    return out, valid


def _combine(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _parents_from_list(list_arr: pa.Array) -> np.ndarray:
    """Row index of each flattened element of a list array."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    counts = pc.list_value_length(list_arr).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    return np.repeat(np.arange(len(list_arr), dtype=np.int64), counts)


def parse_attrs_column(field_arr: pa.Array) -> pa.MapArray:
    """Escaped 'k=t:v;...' strings -> map<string,string> with tagged 't:v' values."""
    n = len(field_arr)
    pairs_list = pc.split_pattern(field_arr, pattern=";")
    if isinstance(pairs_list, pa.ChunkedArray):
        pairs_list = pairs_list.combine_chunks()
    flat = pairs_list.flatten()
    parents = _parents_from_list(pairs_list)
    # an empty attrs field splits to a single '' element -> drop it
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    flat = flat.filter(pa.array(keep))
    parents = parents[keep]
    kv = pc.split_pattern(flat, pattern="=", max_splits=1)
    if isinstance(kv, pa.ChunkedArray):
        kv = kv.combine_chunks()
    # guard: drop malformed pairs lacking '=' (dead-letter semantics) — a
    # pair splits into 2 elements iff it contains '=' (cheaper than a
    # byte-scan of the strings)
    has_eq = pc.equal(pc.list_value_length(kv), 2).to_numpy(
        zero_copy_only=False
    )
    has_eq = np.nan_to_num(has_eq, nan=False).astype(bool)
    if not has_eq.all():
        m = pa.array(has_eq)
        kv = kv.filter(m)
        parents = parents[has_eq]
    keys = unescape_array(pc.list_element(kv, 0))
    tv = pc.list_element(kv, 1)
    tags = pc.utf8_slice_codeunits(tv, start=0, stop=1)
    values = unescape_array(pc.utf8_slice_codeunits(tv, start=2, stop=1 << 62))
    tagged = pc.binary_join_element_wise(tags, values, pa.scalar(":", type=tags.type))
    counts = np.bincount(parents, minlength=n).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return pa.MapArray.from_arrays(
        pa.array(offsets, pa.int32()),
        keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys,
        tagged.combine_chunks() if isinstance(tagged, pa.ChunkedArray) else tagged,
    )


def parse_pages_batch(
    batch: pa.Table,
    include_event_names: tuple[str, ...] = (),
    collect_malformed: bool = False,
) -> pa.Table | tuple[pa.Table, pa.Table]:
    """Flat-map one pages batch -> events table (EVENTS_SCHEMA).

    Applies the include_event_names filter (reference connector.go:219-224)
    in the same pass via a vectorized is_in mask.

    ``collect_malformed=True`` additionally returns the dead-letter table
    (DEADLETTER_SCHEMA: url, raw, reason) of OTEL1 lines dropped by any
    validity stage — gathered from the SAME pass, so audit mode never parses
    the input twice. The include filter is NOT a validity stage: excluded
    events are well-formed and never dead-lettered.
    """
    dead_lines: list[pa.Array] = []
    dead_parents: list[np.ndarray] = []
    dead_reasons: list[tuple[str, int]] = []

    def _collect(cur_lines: pa.Array, cur_parents: np.ndarray, bad: np.ndarray, reason: str):
        if collect_malformed and bad.any():
            dead_lines.append(_combine(cur_lines.filter(pa.array(bad))))
            dead_parents.append(cur_parents[bad])
            dead_reasons.append((reason, int(bad.sum())))

    text = batch.column("text").combine_chunks()
    if isinstance(text, pa.ChunkedArray):  # single-chunk after combine
        text = text.chunk(0) if text.num_chunks else pa.array([], pa.large_string())
    lines_list = pc.split_pattern(text, pattern="\n")
    if isinstance(lines_list, pa.ChunkedArray):
        lines_list = lines_list.combine_chunks()
    lines = lines_list.flatten()
    parents = _parents_from_list(lines_list)

    is_event = pc.starts_with(lines, "OTEL1 ").to_numpy(zero_copy_only=False)
    is_event = np.nan_to_num(is_event, nan=False).astype(bool)
    lines = lines.filter(pa.array(is_event))
    parents = parents[is_event]

    tokens = pc.split_pattern(lines, pattern=" ")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    tok_count_ok = pc.equal(pc.list_value_length(tokens), 11).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    _collect(lines, parents, ~tok_count_ok, "bad_token_count")
    lines = lines.filter(pa.array(tok_count_ok))
    tokens = tokens.filter(pa.array(tok_count_ok))
    parents = parents[tok_count_ok]

    fields: dict[str, pa.Array] = {}
    valid = np.ones(len(lines), dtype=bool)
    for i, prefix in enumerate(EVENT_FIELD_PREFIXES):
        tok = pc.list_element(tokens, i + 1)
        ok = pc.starts_with(tok, prefix).to_numpy(zero_copy_only=False)
        valid &= np.nan_to_num(ok, nan=False).astype(bool)
        fields[prefix[:-1]] = pc.utf8_slice_codeunits(
            tok, start=len(prefix), stop=1 << 62
        )

    # structural validity: hex widths + integer ts
    valid &= pc.equal(pc.utf8_length(fields["trace"]), 32).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    valid &= pc.equal(pc.utf8_length(fields["span"]), 16).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    ts_int = None
    try:
        ts_int = pc.cast(fields["ts"], pa.int64())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # rare fallback when the batch holds any invalid ts: apply Arrow's
        # exact cast grammar ('-?[0-9]+', int64 range) per element so the
        # dead-letter semantics don't depend on which path ran
        vals, ok = [], []
        for s in fields["ts"].to_pylist():
            s = s or ""
            body = s[1:] if s.startswith("-") else s
            good = bool(body) and body.isascii() and body.isdigit()
            v = int(s) if good else 0
            good = good and -(2**63) <= v < 2**63
            ok.append(good)
            vals.append(v if good else 0)
        valid &= np.array(ok, dtype=bool)
        ts_int = pa.array(vals, pa.int64())

    _collect(lines, parents, ~valid, "bad_field_or_ts")
    vmask = pa.array(valid)
    lines = lines.filter(vmask)
    parents = parents[valid]
    ts_int = ts_int.filter(vmask) if isinstance(ts_int, pa.Array) else pc.array_filter(ts_int, vmask)
    fields = {k: v.filter(vmask) for k, v in fields.items()}

    trace_id, hex_ok1 = hex_to_fixed_binary(fields["trace"].combine_chunks() if isinstance(fields["trace"], pa.ChunkedArray) else fields["trace"], 16)
    span_id, hex_ok2 = hex_to_fixed_binary(fields["span"].combine_chunks() if isinstance(fields["span"], pa.ChunkedArray) else fields["span"], 8)
    hex_ok = hex_ok1 & hex_ok2
    _collect(lines, parents, ~hex_ok, "bad_hex")
    if not hex_ok.all():
        hmask = pa.array(hex_ok)
        lines = lines.filter(hmask)
        parents = parents[hex_ok]
        ts_int = ts_int.filter(hmask)
        trace_id = trace_id.filter(hmask)
        span_id = span_id.filter(hmask)
        fields = {k: v.filter(hmask) for k, v in fields.items()}

    event_name = unescape_array(fields["name"])

    # include_event_names filter (op C) — exact match membership
    if include_event_names:
        inc = pc.is_in(
            event_name, value_set=pa.array(list(include_event_names), pa.string())
        ).to_numpy(zero_copy_only=False)
        inc = np.nan_to_num(inc, nan=False).astype(bool)
        imask = pa.array(inc)
        lines = lines.filter(imask)
        parents = parents[inc]
        ts_int = ts_int.filter(imask)
        trace_id = trace_id.filter(imask)
        span_id = span_id.filter(imask)
        event_name = event_name.filter(imask)
        fields = {k: v.filter(imask) for k, v in fields.items()}

    take_idx = pa.array(parents)
    # one attrs-parse pass over all three sources, then zero-copy slices
    m = len(lines)
    combined = pa.concat_arrays(
        [
            _combine(fields["attrs"]),
            _combine(fields["sattrs"]),
            _combine(fields["rattrs"]),
        ]
    )
    all_maps = parse_attrs_column(combined)
    cols = {
        "url": pc.take(batch.column("url"), take_idx),
        "warc_ts": pc.take(batch.column("warc_ts"), take_idx),
        "lang": pc.take(batch.column("lang"), take_idx),
        "trace_id": trace_id,
        "span_id": span_id,
        "span_name": unescape_array(fields["span_name"]),
        "span_kind": fields["span_kind"],
        "trace_state": unescape_array(fields["state"]),
        "event_name": event_name,
        "event_ts": pc.cast(ts_int, pa.timestamp("ns")),
        "event_attrs": all_maps.slice(0, m),
        "span_attrs": all_maps.slice(m, m),
        "resource_attrs": all_maps.slice(2 * m, m),
        "raw": pc.cast(lines, pa.large_string()),
    }
    arrays = []
    for f in EVENTS_SCHEMA:
        a = cols[f.name]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        arrays.append(pc.cast(a, f.type) if a.type != f.type else a)
    events = pa.Table.from_arrays(arrays, schema=EVENTS_SCHEMA)
    if not collect_malformed:
        return events
    if dead_lines:
        d_lines = pa.concat_arrays(dead_lines)
        d_parents = np.concatenate(dead_parents)
        d_reason = pa.array(
            np.repeat(
                np.array([r for r, _ in dead_reasons], dtype=object),
                [c for _, c in dead_reasons],
            ),
            pa.string(),
        )
        dead = pa.table(
            {
                "url": _combine(
                    pc.take(batch.column("url"), pa.array(d_parents))
                ),
                "raw": pc.cast(d_lines, pa.large_string()),
                "reason": d_reason,
            }
        ).cast(DEADLETTER_SCHEMA)
    else:
        dead = DEADLETTER_SCHEMA.empty_table()
    return events, dead


def make_parse_fn(include_event_names: tuple[str, ...] = ()):
    """Closure for ds.map_batches(..., batch_format='pyarrow')."""

    def _parse(batch: pa.Table) -> pa.Table:
        return parse_pages_batch(batch, include_event_names)

    return _parse


DEADLETTER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("raw", pa.large_string()),
        ("reason", pa.string()),
    ]
)


def make_deadletter_fn():
    """map_batches fn extracting the MALFORMED OTEL1 lines (poison pills) as
    (url, raw, reason) rows — the dead-letter side channel (SURVEY §4: parse
    failures must not kill the job, and must stay auditable). The rows come
    from the SAME vectorized parse pass (collect_malformed=True), so audit
    mode never parses a page twice; `reason` names the validity stage that
    rejected the line (bad_token_count / bad_field_or_ts / bad_hex)."""

    def _dead(batch: pa.Table) -> pa.Table:
        _events, dead = parse_pages_batch(batch, collect_malformed=True)
        return dead

    return _dead


# ---------------------------------------------------------------------------
# self-telemetry (SURVEY.md §2 op M: total_events_found / events_processed /
# malformed dead-letters, as per-batch counter rows summed downstream)
# ---------------------------------------------------------------------------

def make_parse_stats_fn(include_event_names: tuple[str, ...] = ()):
    """map_batches fn emitting ONE counter row per batch; sum for totals."""

    def _stats(batch: pa.Table) -> pa.Table:
        n_pages = batch.num_rows
        text = batch.column("text")
        newlines = pc.sum(pc.count_substring(text, pattern="\n")).as_py() or 0
        lines_total = newlines + n_pages
        otel_lines = (pc.sum(pc.count_substring(text, pattern="\nOTEL1 ")).as_py() or 0) + (
            pc.sum(
                pc.cast(pc.starts_with(text, "OTEL1 "), pa.int64())
            ).as_py()
            or 0
        )
        events = parse_pages_batch(batch)
        parsed = events.num_rows
        if include_event_names:  # one is_in mask, not a second full parse
            inc = pc.is_in(
                events.column("event_name"),
                value_set=pa.array(list(include_event_names), pa.string()),
            )
            kept = pc.sum(pc.cast(inc, pa.int64())).as_py() or 0
        else:
            kept = parsed
        return pa.table(
            {
                "pages": pa.array([n_pages], pa.int64()),
                "lines_total": pa.array([lines_total], pa.int64()),
                "otel_lines": pa.array([otel_lines], pa.int64()),
                "total_events_found": pa.array([parsed], pa.int64()),
                "events_processed": pa.array([kept], pa.int64()),
                "malformed_lines": pa.array([otel_lines - parsed], pa.int64()),
            }
        )

    return _stats
