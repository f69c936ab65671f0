"""Ports of TestMapSeverity (33 cases) and TestSeverityNumberToText (10 cases)
from /root/reference/spaneventtologconnector/connector_test.go:479-561, plus
equivalence of the vectorized batch resolvers."""

import numpy as np
import pyarrow as pa
import pytest

from otelcol_con_spaneventtolog_ray.sevmap import (
    CLOSED_VOCAB,
    map_severity,
    map_severity_batch,
    severity_number_to_text,
    severity_number_to_text_batch,
)

# (input, expected number, expected canonical text) — connector_test.go:505-561
MAP_SEVERITY_CASES = [
    ("trace", 1, "trace"), ("debug", 5, "debug"), ("info", 9, "info"),
    ("warn", 13, "warn"), ("error", 17, "error"), ("fatal", 21, "fatal"),
    ("trace1", 1, "trace"), ("debug1", 5, "debug"), ("info1", 9, "info"),
    ("warn1", 13, "warn"), ("error1", 17, "error"), ("fatal1", 21, "fatal"),
    ("trace2", 2, "trace2"), ("debug2", 6, "debug2"), ("info2", 10, "info2"),
    ("warn2", 14, "warn2"), ("error2", 18, "error2"), ("fatal2", 22, "fatal2"),
    ("TRACE", 1, "trace"), ("DEBUG", 5, "debug"), ("INFO", 9, "info"),
    ("WARN", 13, "warn"), ("ERROR", 17, "error"), ("FATAL", 21, "fatal"),
    ("warning", 13, "warn"), ("err", 17, "error"),
    ("warning2", 14, "warn2"), ("warning3", 15, "warn3"),
    ("invalid", 0, ""), ("", 0, ""), ("unknown", 0, ""),
]

NUMBER_TO_TEXT_CASES = [
    (1, "trace"), (5, "debug"), (9, "info"), (13, "warn"), (17, "error"),
    (21, "fatal"), (10, "info2"), (19, "error3"), (0, "info"), (999, "info"),
]


@pytest.mark.parametrize("inp,num,txt", MAP_SEVERITY_CASES)
def test_map_severity(inp, num, txt):
    assert map_severity(inp) == (num, txt)


@pytest.mark.parametrize("num,txt", NUMBER_TO_TEXT_CASES)
def test_severity_number_to_text(num, txt):
    assert severity_number_to_text(num) == txt


def test_map_severity_batch_matches_scalar():
    inputs = [c[0] for c in MAP_SEVERITY_CASES] + ["trace21", "WARNING4", "warning10"]
    nums, txts, valid = map_severity_batch(pa.array(inputs, pa.string()))
    for i, s in enumerate(inputs):
        n, t = map_severity(s)
        assert nums[i] == n, s
        assert txts[i] == t, s
        assert valid[i] == (n != 0), s


def test_number_to_text_batch_matches_scalar():
    nums = np.array([n for n, _ in NUMBER_TO_TEXT_CASES] + [-5, 24, 25])
    out = severity_number_to_text_batch(nums)
    for i, n in enumerate(nums):
        assert out[i] == severity_number_to_text(int(n))


def test_closed_vocab_consistency():
    # every vocab entry agrees with the scalar function
    for k, (n, t) in CLOSED_VOCAB.items():
        assert map_severity(k) == (n, t)
    # nothing valid is missing: the accepted language is exactly the vocab
    assert "trace21" in CLOSED_VOCAB and "warning3" in CLOSED_VOCAB
    assert "unspecified" not in CLOSED_VOCAB


def test_map_severity_batch_unicode_lowering_parity():
    """Batch path must use Unicode lowering like the scalar path: non-ASCII
    inputs (Kelvin sign, dotted I, full-width letters) give identical results
    through both, valid or not."""
    inputs = [
        "INFO", "KINFO",  # Kelvin sign lowers to 'k'
        "İNFO",  # dotted capital I -> 'i' + combining dot (invalid both)
        "ＷＡＲＮ",  # full-width (invalid in both, but must agree)
        "İnfo", "warnK", "ERROR", "ıNFO",
    ]
    nums, txts, valid = map_severity_batch(pa.array(inputs, pa.string()))
    for i, s in enumerate(inputs):
        n, t = map_severity(s)
        assert (nums[i], txts[i], valid[i]) == (n, t, n != 0), s
