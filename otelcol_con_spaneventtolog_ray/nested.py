"""Nested attribute values: map- and slice-typed payloads in the OTEL1 grammar.

The reference's general value-copy path carries Str/Int/Double/Bool/Bytes/
Map/Slice values (`connector.go:382-385`; pcommon.Value CopyTo). Our tagged
rendering extends to the full vocabulary:

    t in {s, i, d, b, y, m, l}
      s: string   i: int   d: double   b: bool   y: bytes (hex)
      m: map      l: list/slice

``m``/``l`` payloads are ONE-MORE-TIME-escaped nested renderings of the same
grammar, so escaping composes: the nested rendering's ``=``/``;``/``%`` are
percent-encoded by the OUTER attr-value escape on the wire, the pipeline's
single unescape restores the rendering verbatim (its own inner escapes
intact), and the stored tagged payload is ``m:<rendering>``. Decoding a
nested value is therefore the same ``;``/``=``/positional-``t:v`` split +
one unescape as the top level — recursively, to any depth.

The enrich stage needs NO special casing: nested values ride the generic
copy path (like Double/Bool/Bytes in the reference) and participate in the
D4/D7 collision semantics as opaque tagged payloads, which tests pin.
"""

from __future__ import annotations

from .escape import escape, unescape

#: map rendering: 'k=t:v;...' with k and v escaped (same shape as the
#: top-level attrs field)
def encode_map(pairs: list[tuple[str, str, str]]) -> str:
    return ";".join(f"{escape(k)}={t}:{escape(v)}" for k, t, v in pairs)


#: list rendering: 't:v;...' — tagged values without keys
def encode_list(items: list[tuple[str, str]]) -> str:
    return ";".join(f"{t}:{escape(v)}" for t, v in items)


def decode_map(payload: str) -> list[tuple[str, str, str]]:
    """Inverse of encode_map over a STORED 'm:'-payload (tag stripped).

    Same semantics as the top-level attr parse: pairs without '=' and empty
    pairs are dropped; tag/value split is positional 't:v'.
    """
    if payload == "":
        return []
    out = []
    for pair in payload.split(";"):
        if pair == "" or "=" not in pair:
            continue
        k, _, tv = pair.partition("=")
        out.append((unescape(k), tv[:1], unescape(tv[2:])))
    return out


def decode_list(payload: str) -> list[tuple[str, str]]:
    """Inverse of encode_list over a stored 'l:'-payload (tag stripped)."""
    if payload == "":
        return []
    out = []
    for item in payload.split(";"):
        if item == "":
            continue
        out.append((item[:1], unescape(item[2:])))
    return out
