"""URL canonicalization kernel: edge-case behavior + literal parity with
the DuckDB regex chain used in the oracle mirror (same patterns, same
order), so the two engines cannot drift on RE2 corner cases."""

import duckdb
import numpy as np
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


def test_domain_stats_planted(ray_session, tmp_path):
    """Planted domain/lang fixture: doc_ids 0..3 (dom 0 gets id 0; dom 1
    gets ids 1-3 — the sqrt skew), NULL lang forms its OWN language group
    on both engines, NULL text contributes 0 tokens but still counts as a
    doc."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from tests.test_entry_queries import _canon, _to_df

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "x y", None, "z"], pa.string()),
            "lang": pa.array(["en", "de", None, "de"], pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([5, 3, 0, 1], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    import __ray_entry__ as e

    got = _canon(_to_df(e.queries()["web_domain_stats"](str(tmp_path))))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
    )
    exp = _canon(con.execute(e.oracle_sql()["web_domain_stats"]).df())
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    byhost = got.set_index("host")
    assert byhost.loc["d00.example", "n_docs"] == 1
    assert byhost.loc["d01.example", "n_docs"] == 3
    # de + NULL = two distinct language groups in domain d01
    assert byhost.loc["d01.example", "n_langs"] == 2
    # NULL text adds no tokens: "x y"(2) + None(0) + "z"(1)
    assert byhost.loc["d01.example", "n_tokens"] == 3


def _pagerank_reference(n, iters=3):
    """Independent scalar reference of the fixed-point iteration."""
    rank = [1_000_000] * n
    for _ in range(iters):
        s = [0] * n
        for i in range(n):
            outdeg = 1 + i % 3
            c = rank[i] // outdeg
            for j in range(outdeg):
                s[(i * 7 + j + 1) % n] += c
        rank = [150_000 + (85 * x) // 100 for x in s]
    return rank


def test_pagerank_planted_matches_scalar_reference(ray_session, tmp_path):
    """7-node graph: the distributed scatter-gather must equal the scalar
    loop exactly (integer fixed-point → zero drift), and the SQL mirror
    must agree row for row."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from tests.test_entry_queries import _canon, _to_df

    n = 7
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["t"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    import __ray_entry__ as e

    got = _to_df(e.queries()["web_pagerank"](str(tmp_path)))
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["rank_micro"]) == _pagerank_reference(n)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
    )
    exp = _canon(con.execute(e.oracle_sql()["web_pagerank"]).df())
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_crawl_frontier_planted_matches_scalar_bfs(ray_session, tmp_path):
    """9-node graph, seed = node 0: the distributed 2-hop frontier must
    equal a scalar BFS (min hop per reached node), and the SQL mirror must
    agree row for row."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from tests.test_entry_queries import _canon, _to_df

    n = 9
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["t"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))

    # scalar BFS reference over the functional edge rule
    hops = {0: 0}
    frontier = [0]
    for h in (1, 2):
        nxt = []
        for i in frontier:
            for j in range(1 + i % 3):
                d = (i * 7 + j + 1) % n
                if d not in hops:
                    hops[d] = h
                    nxt.append(d)
                elif hops[d] > h:
                    hops[d] = h
        frontier = nxt
    import __ray_entry__ as e

    got = _to_df(e.queries()["web_crawl_frontier"](str(tmp_path)))
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert dict(zip(got["doc_id"], got["hop"])) == hops
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
    )
    exp = _canon(con.execute(e.oracle_sql()["web_crawl_frontier"]).df())
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_domain_cap_global_smallest_across_blocks(ray_session, tmp_path):
    """Adversarial block split: each domain's crawl-priority-smallest ids
    are scattered across MANY parquet row groups, so a per-block cap alone
    would keep the wrong candidates — the final groupby fold must pick the
    GLOBAL smallest K. Oracle = the mirror's row_number semantics in
    DuckDB over the same file."""
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from tests.test_entry_queries import _canon, _to_df

    rng = np.random.default_rng(7)
    ids = rng.permutation(np.arange(4000, dtype=np.int64))  # shuffled order
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["w"] * len(ids), pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
        }
    )
    pq.write_table(
        tbl, os.path.join(tmp_path, "documents.parquet"), row_group_size=250
    )
    got = _canon(_to_df(e.queries()["web_domain_cap"](str(tmp_path))))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
    )
    exp = _canon(con.execute(e.oracle_sql()["web_domain_cap"]).df())
    assert len(got) == len(exp)
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the cap must actually bind: 4000 docs -> every domain saturates
    assert got.groupby("host").size().max() == 25


def test_hits_matches_dense_reference(ray_session, tmp_path):
    """HITS over the functional doc_id graph equals a dense numpy
    h/a alternation (integer, unnormalized) at every node."""
    import pyarrow.parquet as pq
    from otelcol_con_spaneventtolog_ray.functions.weburl import (
        HITS_ITERS,
        _HITS_INIT,
        q_hits,
    )

    n = 37  # gcd(7, 37) = 1 but ANY n must agree with the dense reference
    tbl = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([5] * n, pa.int64()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    A = np.zeros((n, n), dtype=np.int64)  # A[i, j] = 1 iff i -> j
    for i in range(n):
        for j in range(1 + i % 3):
            A[i, (i * 7 + j + 1) % n] = 1
    h = np.full(n, _HITS_INIT, dtype=np.int64)
    for _ in range(HITS_ITERS):
        a = A.T @ h
        h = A @ a
    got = q_hits(str(d)).to_pandas().set_index("doc_id")
    assert np.array_equal(got["hub_micro"].to_numpy(), h)
    assert np.array_equal(got["auth_micro"].to_numpy(), a)


def test_web_components_blocks_and_isolated_tail(ray_session, tmp_path):
    """Components are exactly the WEB_CC_BLOCK-sized blocks; a 1-node tail
    block (possible when N ≡ 1 mod BLOCK) is its own component via the
    isolated-node join-back."""
    import pyarrow.parquet as pq
    from otelcol_con_spaneventtolog_ray.functions.weburl import (
        WEB_CC_BLOCK,
        q_web_components,
    )

    n = WEB_CC_BLOCK * 2 + 1  # blocks: [0..96], [97..193], {194} isolated
    tbl = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([1] * n, pa.int64()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = q_web_components(str(d)).to_pandas()
    assert len(out) == n
    comp = out.set_index("doc_id")["component"]
    exp = np.array([(i // WEB_CC_BLOCK) * WEB_CC_BLOCK for i in range(n)])
    assert np.array_equal(comp.to_numpy(), exp)
    assert comp.loc[n - 1] == n - 1  # the isolated tail node
