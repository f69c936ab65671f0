"""Vectorized enrich stage (SURVEY.md §2 ops D/E/F/G) — actor-pool stage.

Implements populateLogRecord (`connector.go:261-404`) as column expressions
over the events table: the 4-level severity precedence chain (§2.1), body
mapping, and the ordered attribute-map build (event attrs -> event_name ->
level -> span attrs -> trace.state/span.name/span.kind) with the reference's
collision semantics (first-insertion position, last-writer value).

``Enricher`` is a callable class for ``ds.map_batches(Enricher, fn_constructor_args=...,
concurrency=N)``: config rules (include set, sorted substring rules, severity
vocab) are compiled once per actor in ``__init__``; ``__call__`` is pure
vectorized work per batch.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..sevmap import map_severity_batch, severity_number_to_text_batch

LOG_RECORDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("timestamp", pa.timestamp("ns")),
        ("observed_timestamp", pa.timestamp("ns")),
        ("severity_number", pa.int32()),
        ("severity_text", pa.string()),
        ("body", pa.large_string()),
        ("attributes", pa.map_(pa.string(), pa.string())),
        ("trace_id", pa.binary(16)),
        ("span_id", pa.binary(8)),
        ("resource_attrs", pa.map_(pa.string(), pa.string())),
        ("sink", pa.string()),
        ("event_name", pa.string()),
        ("lang", pa.string()),
    ]
)

_SINK_CLASSES = np.array(
    ["trace", "debug", "info", "warn", "error", "fatal"], dtype=object
)


def severity_class_batch(numbers: np.ndarray) -> np.ndarray:
    """Routing key per row: base class of severity_number, else 'unspecified'."""
    out = np.full(len(numbers), "unspecified", dtype=object)
    in_range = (numbers >= 1) & (numbers <= 24)
    idx = np.clip((numbers - 1) // 4, 0, 5).astype(np.int64)
    out[in_range] = _SINK_CLASSES[idx[in_range]]
    return out


def _as_single(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _np_str(arr) -> np.ndarray:
    """Arrow string array -> numpy object array (nulls -> None)."""
    return _as_single(arr).to_numpy(zero_copy_only=False)


def map_first_lookup(ma: pa.MapArray, key: str) -> tuple[np.ndarray, np.ndarray]:
    """First-occurrence Map.Get semantics: (tags, values) object arrays,
    None where the key is absent. Values are the untagged payload strings."""
    got = _as_single(pc.map_lookup(ma, query_key=key, occurrence="first"))
    # tagged payloads are 't:v'; a degenerate <2-char payload gets tag ''
    long_enough = pc.greater_equal(pc.utf8_length(got), 2)
    tags_arr = pc.if_else(
        long_enough, pc.utf8_slice_codeunits(got, start=0, stop=1), pa.scalar("")
    )
    tags = tags_arr.to_numpy(zero_copy_only=False)
    vals = pc.utf8_slice_codeunits(got, start=2, stop=1 << 30).to_numpy(
        zero_copy_only=False
    )
    return tags, vals


def _flatten_map(ma: pa.MapArray) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """(rows, keys, tagged_values): numpy row ids + Arrow child slices."""
    ma = _as_single(ma)
    offsets = np.frombuffer(ma.buffers()[1], dtype=np.int32)[
        ma.offset : ma.offset + len(ma) + 1
    ].astype(np.int64)
    counts = np.diff(offsets)
    rows = np.repeat(np.arange(len(ma), dtype=np.int64), counts)
    # .keys/.items are the raw children (offset-unaware) -> slice explicitly
    lo, hi = int(offsets[0]), int(offsets[-1])
    keys = ma.keys.slice(lo, hi - lo)
    vals = ma.items.slice(lo, hi - lo)
    return rows, keys, vals


def _key_codes(keys: pa.Array, rows: np.ndarray) -> np.ndarray:
    """(row, key) pair ids: Arrow-side key dictionary-encode (C++ hash), then
    integer combine — avoids Python-object hashing entirely."""
    enc = pc.dictionary_encode(keys)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(enc.dictionary)
    return rows * max(k, 1) + codes


def _group_first_last(pair: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Per distinct pair: (first_idx, last_idx) original positions, or None
    when there are no duplicates at all."""
    order0 = np.argsort(pair, kind="stable")
    sp = pair[order0]
    grp_start = np.ones(len(sp), dtype=bool)
    grp_start[1:] = sp[1:] != sp[:-1]
    if grp_start.all():
        return None
    starts = np.flatnonzero(grp_start)
    ends = np.concatenate([starts[1:], [len(sp)]]) - 1
    return order0[starts], order0[ends]


def _dedup_source(
    rows: np.ndarray, keys: pa.Array, vals: pa.Array, keep: str
) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """Within-source duplicate-key handling: position of first, value per `keep`."""
    if len(rows) == 0:
        return rows, keys, vals
    fl = _group_first_last(_key_codes(keys, rows))
    if fl is None:
        return rows, keys, vals
    first_idx, last_idx = fl
    val_idx = first_idx if keep == "first" else last_idx
    o = np.argsort(first_idx)  # restore insertion order (rows stay sorted)
    first_idx, val_idx = first_idx[o], val_idx[o]
    return rows[first_idx], keys.take(first_idx), vals.take(val_idx)


def merge_attr_sources(
    n: int, sources: list[tuple[np.ndarray, pa.Array, pa.Array]]
) -> pa.MapArray:
    """Merge ordered (rows, keys, tagged_vals) sources into one map column with
    reference collision semantics: first-source insertion position, last-source
    value. Sources must each be sorted by row."""
    sources = [s for s in sources if len(s[0])]
    if not sources:
        return empty_maps(n)
    rows = np.concatenate([s[0] for s in sources])
    keys = pa.concat_arrays([_as_single(s[1]) for s in sources])
    vals = pa.concat_arrays([_as_single(s[2]) for s in sources])
    fl = _group_first_last(_key_codes(keys, rows))
    if fl is None:
        # no collisions: per-row order is (source, local) = global seq order
        # within each row because sources are concatenated in order
        idx = np.argsort(rows, kind="stable")
        rows_f = rows[idx]
    else:
        first_idx, last_idx = fl
        # row-major, then first-writer position within the row; value/key
        # taken from the last writer of each (row, key) pair
        o = np.lexsort((first_idx, rows[first_idx]))
        idx = last_idx[o]
        rows_f = rows[first_idx[o]]
    counts = np.bincount(rows_f, minlength=n).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return pa.MapArray.from_arrays(
        pa.array(offsets, pa.int32()), keys.take(idx), vals.take(idx)
    )


def empty_maps(n: int) -> pa.MapArray:
    return pa.MapArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()),
        pa.array([], pa.string()),
        pa.array([], pa.string()),
    )


def _tag_s(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """'s:' + value, vectorized (string-tag rendering for synthetic attrs)."""
    return _as_single(
        pc.binary_join_element_wise(pa.scalar("s:"), _as_single(arr), pa.scalar(""))
    )


def _const_source(
    mask: np.ndarray, key: str, tagged_vals: pa.Array
) -> tuple[np.ndarray, pa.Array, pa.Array]:
    rows = np.nonzero(mask)[0].astype(np.int64)
    if len(rows) == len(mask):
        vals = _as_single(tagged_vals)
    else:
        vals = _as_single(tagged_vals).take(rows)
    return rows, _as_single(pa.repeat(key, len(rows))), vals


def apply_event_name_rules(
    event_name: pa.Array | pa.ChunkedArray,
    rules: list[tuple[str, int, str]],
    sev_num: np.ndarray,
    sev_text: np.ndarray,
    assigned: np.ndarray,
) -> None:
    """E4: case-insensitive substring rules, first match in longest-key order
    wins for rows not yet assigned (connector.go:312-335). Mutates
    sev_num/sev_text/assigned in place; shared by the enrich stage and the
    events_severity_route driver query so the semantics can't drift."""
    lower_names = pc.utf8_lower(_as_single(event_name))
    for key, num, txt in rules:
        mm = pc.match_substring(lower_names, key).to_numpy(zero_copy_only=False)
        mm = np.nan_to_num(mm, nan=False).astype(bool) & ~assigned
        if mm.any():
            sev_num[mm] = num
            sev_text[mm] = txt
            assigned |= mm


def _parse_int_strs(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """'i:'-tagged payloads -> (int64 values, valid mask) under the pinned
    integer grammar ('-?[0-9]+', int64 range — same as the ts field); a
    malformed int payload simply doesn't fire E1 (dead-letter fall-through,
    mirrored in oracle.populate_log_record)."""
    ints = np.zeros(len(vals), dtype=np.int64)
    ok = np.zeros(len(vals), dtype=bool)
    for i, s in enumerate(vals):
        if s is None:
            continue
        body = s[1:] if s[:1] == "-" else s
        if body and body.isascii() and body.isdigit():
            v = int(s)
            if -(2**63) <= v < 2**63:
                ints[i] = v
                ok[i] = True
    return ints, ok


def enrich_events_batch(
    events: pa.Table,
    cfg: PipelineConfig,
    rules: list[tuple[str, int, str]] | None = None,
) -> pa.Table:
    """events table (EVENTS_SCHEMA) -> log-records table (LOG_RECORDS_SCHEMA).

    ``rules`` lets callers (the Enricher actor) pass the precompiled
    severity_by_event_name rules instead of re-deriving them per batch.
    """
    n = events.num_rows
    am = cfg.attribute_mappings
    event_attrs = _as_single(events.column("event_attrs"))
    event_name = _as_single(events.column("event_name"))
    event_name_np = _np_str(event_name)

    # --- severity precedence chain (connector.go:266-335) ---
    sev_num = np.full(n, 9, dtype=np.int64)
    sev_text = np.full(n, "info", dtype=object)
    found = np.zeros(n, dtype=bool)

    if am.severity_number or am.severity_text:
        if am.severity_number:
            tags, vals = map_first_lookup(event_attrs, am.severity_number)
            m = tags == "i"
            if m.any():
                iv_all, ok_int = _parse_int_strs(vals[m])
                m2 = m.copy()
                m2[np.nonzero(m)[0][~ok_int]] = False
                if m2.any():
                    # wrap at assignment: plog.SeverityNumber is int32 in the
                    # reference, so text AND sink derive from the wrapped
                    # value (mirrored in oracle.populate_log_record). Low 32
                    # bits reinterpreted as int32 == Go's int64->int32 cast.
                    iv = (
                        iv_all[ok_int]
                        .astype(np.uint64)
                        .astype(np.uint32)
                        .view(np.int32)
                        .astype(np.int64)
                    )
                    sev_num[m2] = iv
                    sev_text[m2] = severity_number_to_text_batch(iv)
                    found |= m2
        if am.severity_text:
            tags, vals = map_first_lookup(event_attrs, am.severity_text)
            m = tags == "s"
            if m.any():
                sev_text[m] = vals[m]  # raw text kept (connector.go:285)
                parse_m = m & ~found  # number from text only if E1 didn't fire
                if parse_m.any():
                    nums, canon, valid = map_severity_batch(
                        pa.array(np.where(pd.isna(vals), "", vals), pa.string())
                    )
                    ok = parse_m & valid
                    sev_num[ok] = nums[ok]
                    sev_text[ok] = canon[ok]  # canonicalized
                found |= m  # fires even when unparseable (blocks E3/E4)
    if cfg.severity_attribute:
        rem = ~found
        if rem.any():
            tags, vals = map_first_lookup(event_attrs, cfg.severity_attribute)
            m = (tags == "s") & rem
            if m.any():
                nums, canon, valid = map_severity_batch(
                    pa.array(np.where(pd.isna(vals), "", vals), pa.string())
                )
                ok = m & valid
                sev_num[ok] = nums[ok]
                sev_text[ok] = canon[ok]
                found |= ok
    if rules is None:
        rules = cfg.sorted_event_name_rules()
    if rules and (~found).any():
        apply_event_name_rules(event_name, rules, sev_num, sev_text, found.copy())

    # --- body (connector.go:348-358) ---
    body = event_name
    if am.body:
        tags, vals = map_first_lookup(event_attrs, am.body)
        m = tags == "s"
        if m.any():
            body_np = event_name_np.copy()
            body_np[m] = vals[m]
            body = pa.array(body_np, pa.string())

    # --- attributes map build (connector.go:361-403) ---
    sources: list[tuple[np.ndarray, pa.Array, pa.Array]] = []
    has_level = np.zeros(n, dtype=bool)
    if cfg.should_copy_attributes("event.attributes"):
        r, k, v = _dedup_source(*_flatten_map(event_attrs), keep="first")
        sources.append((r, k, v))
        if cfg.add_level:
            lvl = pc.equal(k, "level").to_numpy(zero_copy_only=False)
            lvl = np.nan_to_num(lvl, nan=False).astype(bool)
            has_level[np.unique(r[lvl])] = True
    if am.event_name:
        sources.append(
            _const_source(np.ones(n, dtype=bool), am.event_name, _tag_s(event_name))
        )
        if am.event_name == "level":
            has_level[:] = True
    if cfg.add_level:
        sev_text_tagged = _tag_s(pa.array(sev_text, pa.string()))
        sources.append(_const_source(~has_level, "level", sev_text_tagged))
    if cfg.should_copy_attributes("span.attributes"):
        r, k, v = _dedup_source(
            *_flatten_map(events.column("span_attrs")), keep="last"
        )
        sources.append((r, k, v))
    if cfg.include_span_context:
        state = _as_single(events.column("trace_state"))
        state_m = pc.and_kleene(
            pc.is_valid(state), pc.not_equal(state, "")
        ).to_numpy(zero_copy_only=False)
        state_m = np.nan_to_num(state_m, nan=False).astype(bool)
        sources.append(_const_source(state_m, "trace.state", _tag_s(state)))
        sources.append(
            _const_source(
                np.ones(n, dtype=bool),
                "span.name",
                _tag_s(events.column("span_name")),
            )
        )
        sources.append(
            _const_source(
                np.ones(n, dtype=bool),
                "span.kind",
                _tag_s(events.column("span_kind")),
            )
        )
    attributes = merge_attr_sources(n, sources)

    if cfg.should_copy_attributes("resource.attributes"):
        r, k, v = _dedup_source(
            *_flatten_map(events.column("resource_attrs")), keep="first"
        )
        resource_attrs = merge_attr_sources(n, [(r, k, v)])
    else:
        resource_attrs = empty_maps(n)

    if cfg.include_span_context:
        trace_id = _as_single(events.column("trace_id"))
        span_id = _as_single(events.column("span_id"))
    else:
        trace_id = pa.nulls(n, pa.binary(16))
        span_id = pa.nulls(n, pa.binary(8))

    obs_ns = (
        cfg.observed_timestamp_ns
        if cfg.observed_timestamp_ns is not None
        else time.time_ns()
    )
    sink = severity_class_batch(sev_num)

    arrays = [
        _as_single(events.column("url")),
        _as_single(events.column("event_ts")),
        pa.array(np.full(n, obs_ns, dtype=np.int64), pa.timestamp("ns")),
        pa.array(sev_num.astype(np.int32), pa.int32()),
        pa.array(sev_text, pa.string()),
        pc.cast(_as_single(body), pa.large_string()),
        attributes,
        trace_id,
        span_id,
        resource_attrs,
        pa.array(sink, pa.string()),
        event_name,
        _as_single(events.column("lang")),
    ]
    arrays = [
        pc.cast(a, f.type) if a.type != f.type else a
        for a, f in zip(arrays, LOG_RECORDS_SCHEMA)
    ]
    return pa.Table.from_arrays(arrays, schema=LOG_RECORDS_SCHEMA)


class Enricher:
    """Actor-pool callable: config compiled once per actor (connector.go:95-112
    analog — eventNameSet / severity dicts / sorted substring rules)."""

    def __init__(self, cfg: PipelineConfig | dict):
        if isinstance(cfg, dict):
            cfg = PipelineConfig.from_dict(cfg)
        cfg.validate()
        self.cfg = cfg
        self._rules = cfg.sorted_event_name_rules()  # precompiled

    def __call__(self, batch: pa.Table) -> pa.Table:
        return enrich_events_batch(batch, self.cfg, rules=self._rules)
