import pyarrow as pa
from hypothesis import given, strategies as st

from otelcol_con_spaneventtolog_ray.escape import escape, unescape, unescape_array


@given(st.text())
def test_roundtrip(s):
    assert unescape(escape(s)) == s


@given(st.text())
def test_escaped_has_no_separators(s):
    e = escape(s)
    assert " " not in e and "=" not in e and ";" not in e and "\n" not in e


def test_vectorized_matches_scalar():
    samples = ["", "a b", "%20", "%2520", "a=b;c", "line\nbreak", "%", "%%", "x%3Dy"]
    arr = pa.array([escape(s) for s in samples], pa.string())
    out = unescape_array(arr).to_pylist()
    assert out == samples
