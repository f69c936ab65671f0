"""URL canonicalization kernel: edge-case behavior + literal parity with
the DuckDB regex chain used in the oracle mirror (same patterns, same
order), so the two engines cannot drift on RE2 corner cases."""

import duckdb
import pyarrow as pa

from otelcol_con_spaneventtolog_ray.functions.weburl import (
    _AUTHORITY,
    _FRAGMENT,
    _QUERY,
    _TRAILING,
    canonicalize_urls,
)

EDGE_URLS = [
    "https://Host.COM/Path/To?q=1#frag",   # query+fragment, mixed-case host
    "HTTP://X.Y/a//",                      # scheme case, double trailing /
    "https://h",                           # authority only, no path
    "https://h/?q=2",                      # query right after /
    "https://h/p#a?b",                     # ? inside fragment: # wins
    "https://h/CaseKept/Path",             # path case preserved
    "https://docs.example/00000007/",      # trailing slash variant
    "https://h/p?",                        # empty query
    "https://h/p#",                        # empty fragment
]

EXPECTED = [
    "https://host.com/Path/To",
    "http://x.y/a",
    "https://h",
    "https://h",
    "https://h/p",
    "https://h/CaseKept/Path",
    "https://docs.example/00000007",
    "https://h/p",
    "https://h/p",
]


def test_canonicalize_edge_cases():
    got = canonicalize_urls(pa.array(EDGE_URLS, pa.string())).to_pylist()
    assert got == EXPECTED


def test_canonicalize_matches_duckdb_chain():
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in EDGE_URLS])
    sql = f"""
    SELECT regexp_replace(
             lower(regexp_extract(
               regexp_replace(regexp_replace(url, '{_FRAGMENT}', ''),
                              '{_QUERY}', ''),
               '{_AUTHORITY}'))
             || regexp_replace(
                  regexp_replace(regexp_replace(url, '{_FRAGMENT}', ''),
                                 '{_QUERY}', ''),
                  '{_AUTHORITY}', ''),
             '{_TRAILING}', '')
    FROM u
    """
    exp = [r[0] for r in con.execute(sql).fetchall()]
    got = canonicalize_urls(pa.array(EDGE_URLS, pa.string())).to_pylist()
    assert got == exp == EXPECTED
