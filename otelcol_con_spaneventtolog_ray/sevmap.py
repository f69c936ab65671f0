"""Severity number/text mapping tables and scalar + vectorized resolvers.

Semantics mirror the reference connector's severity machinery
(`/root/reference/spaneventtologconnector/connector.go:27-80, 416-453`):

* 24 canonical (number, text) pairs: trace/debug/info/warn/error/fatal x 4.
* Reverse lookup includes aliases ``warning`` -> warn, ``err`` -> error.
* ``map_severity`` is case-insensitive and additionally accepts:
  - ``"<valid>1"`` suffix variants (``trace1`` -> trace, ``trace21`` -> trace2),
  - ``"warning<N>"`` rewrites to ``"warn<N>"`` (``warning2`` -> warn2).
  Invalid input -> ``(0, "")`` (SeverityNumberUnspecified).
* ``severity_number_to_text`` defaults unknown numbers to ``"info"``.

Because the accepted input vocabulary is finite, a closed lookup table over
every valid (lowercased) input is precomputed so batch resolution is a single
dictionary join (``pc.index_in`` against ``VOCAB_ARRAY``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEVERITY_UNSPECIFIED = 0

_BASES = ["trace", "debug", "info", "warn", "error", "fatal"]

#: canonical (number, text) pairs — number 1..24
SEVERITY_MAPPINGS: list[tuple[int, str]] = []
for _i, _base in enumerate(_BASES):
    for _lvl in range(1, 5):
        _num = _i * 4 + _lvl
        _txt = _base if _lvl == 1 else f"{_base}{_lvl}"
        SEVERITY_MAPPINGS.append((_num, _txt))

#: number -> canonical text
SEVERITY_TO_TEXT: dict[int, str] = {n: t for n, t in SEVERITY_MAPPINGS}

#: lowercase text -> number, including aliases (warning -> warn, err -> error)
TEXT_TO_SEVERITY: dict[str, int] = {t: n for n, t in SEVERITY_MAPPINGS}
TEXT_TO_SEVERITY["warning"] = TEXT_TO_SEVERITY["warn"]
TEXT_TO_SEVERITY["err"] = TEXT_TO_SEVERITY["error"]

#: the 25 strings config validation accepts for severity_by_event_name values
VALID_CONFIG_SEVERITIES = frozenset(t for _, t in SEVERITY_MAPPINGS) | {"unspecified"}


def severity_number_to_text(number: int) -> str:
    """Number -> canonical text; unknown/unspecified -> ``"info"``."""
    return SEVERITY_TO_TEXT.get(number, "info")


def simple_lower(s: str) -> str:
    """Go ``strings.ToLower`` semantics (simple per-rune Unicode mapping) via
    the same Arrow kernel every batch path uses — U+0130 'İ' -> 'i', unlike
    Python's full-mapping ``str.lower()`` ('i' + combining dot). Keeps the
    scalar resolvers definitionally identical to the vectorized ones AND to
    the reference (connector.go:419)."""
    if s.isascii():
        return s.lower()
    return pc.utf8_lower(pa.array([s], pa.string()))[0].as_py()


def map_severity(severity: str) -> tuple[int, str]:
    """Case-insensitive text -> (number, canonical text); invalid -> (0, "")."""
    lower = simple_lower(severity)
    num = TEXT_TO_SEVERITY.get(lower)
    if num is not None:
        return num, SEVERITY_TO_TEXT[num]
    # "<base>1" suffix variants, e.g. trace1 -> trace, trace21 -> trace2
    if lower.endswith("1"):
        num = TEXT_TO_SEVERITY.get(lower[:-1])
        if num is not None:
            return num, SEVERITY_TO_TEXT[num]
    # "warning<N>" -> "warn<N>"
    if lower.startswith("warning") and len(lower) > 7:
        num = TEXT_TO_SEVERITY.get("warn" + lower[7:])
        if num is not None:
            return num, SEVERITY_TO_TEXT[num]
    return SEVERITY_UNSPECIFIED, ""


def _build_closed_vocab() -> dict[str, tuple[int, str]]:
    """Every lowercased string map_severity accepts, with its result."""
    vocab: dict[str, tuple[int, str]] = {}
    candidates = set(TEXT_TO_SEVERITY)
    candidates |= {t + "1" for t in TEXT_TO_SEVERITY}
    candidates |= {"warning" + str(i) for i in range(1, 5)}
    for cand in candidates:
        num, txt = map_severity(cand)
        if num != SEVERITY_UNSPECIFIED:
            vocab[cand] = (num, txt)
    return vocab


CLOSED_VOCAB: dict[str, tuple[int, str]] = _build_closed_vocab()

#: Arrow-side closed vocabulary for vectorized joins
VOCAB_ARRAY = pa.array(list(CLOSED_VOCAB.keys()), type=pa.string())
VOCAB_NUMBERS = np.array([v[0] for v in CLOSED_VOCAB.values()], dtype=np.int64)
VOCAB_TEXTS = np.array([v[1] for v in CLOSED_VOCAB.values()], dtype=object)

#: dense number -> text array for vectorized severity_number_to_text (index 0..25)
_NUM2TEXT = np.array(
    ["info"] + [SEVERITY_TO_TEXT.get(i, "info") for i in range(1, 25)], dtype=object
)


def map_severity_batch(texts: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``map_severity`` over an Arrow string array.

    Returns ``(numbers:int64, canon_texts:object, valid:bool)`` numpy arrays;
    null/invalid inputs get ``(0, "", False)``.
    """
    # utf8_lower (not ascii_lower): the scalar map_severity and the Go
    # reference both lowercase with Unicode rules, so the batch path must be
    # definitionally identical even for non-ASCII inputs (e.g. U+212A -> 'k')
    lower = pc.utf8_lower(texts)
    idx = pc.index_in(lower, value_set=VOCAB_ARRAY)
    idx_np = idx.to_numpy(zero_copy_only=False)
    valid = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else idx.is_valid().to_numpy(
        zero_copy_only=False
    )
    pos = np.where(valid, np.nan_to_num(idx_np, nan=0).astype(np.int64), 0)
    numbers = np.where(valid, VOCAB_NUMBERS[pos], 0)
    out_texts = np.where(valid, VOCAB_TEXTS[pos], "")
    return numbers.astype(np.int64), out_texts, valid


def severity_number_to_text_batch(numbers: np.ndarray) -> np.ndarray:
    """Vectorized number -> canonical text with 'info' default (object dtype)."""
    clipped = np.where((numbers >= 1) & (numbers <= 24), numbers, 0).astype(np.int64)
    return _NUM2TEXT[clipped]
