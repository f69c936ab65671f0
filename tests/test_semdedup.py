"""SemDeDup (dedup_semantic_keep) semantics: brute-force oracle equality,
a planted dominance chain, and the cell-size fail-fast cap.

The SQL-gate parity at sf0.001 runs via SQL_CHECKED in test_functions.py;
these tests pin the RULE itself (one-shot dominance, documented in
similarity.py) independently of the DuckDB mirror.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_entry_queries import SF_DIR, _canon, _to_df
from otelcol_con_spaneventtolog_ray.functions import similarity as sim


def _bruteforce_keep(ids, mat, cells, scores, tau):
    """O(n^2) reference implementation of the documented rule."""
    nm = sim._norm_rows(mat)
    keep = np.ones(len(ids), dtype=bool)
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i == j or cells[i] != cells[j]:
                continue
            if round(float(nm[i] @ nm[j]), 6) < tau:
                continue
            if scores[j] > scores[i] or (
                scores[j] == scores[i] and ids[j] < ids[i]
            ):
                keep[i] = False
                break
    return keep


def test_semdedup_matches_bruteforce_oracle(ray_session):
    """Full-corpus exact equality vs a per-pair Python reference at sf0.001."""
    got = _to_df(sim.q_semdedup_keep(SF_DIR)).set_index("vec_id")
    full = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids, mat = sim._batch_matrix(full)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cn = sim._ivf_centroids(SF_DIR)
    cells, scores = sim._assign_cells(mat, cn)
    keep = _bruteforce_keep(ids, mat, cells, scores, sim.SEMDEDUP_THRESHOLD)
    assert len(got) == len(ids)
    assert (got.loc[ids, "cell"].to_numpy() == cells).all()
    assert (got.loc[ids, "keep"].to_numpy() == keep).all()
    # the corpus actually exercises both outcomes
    assert keep.any() and (~keep).any()


def _write_emb(tmp_path, vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_planted_chain(ray_session, tmp_path):
    """Seeds e0..e7 are their own cells; v8/v9/v10 land in cell 0 with
    centrality .196 > .148 > .0995. cos(v8,v9)=.514 and cos(v9,v10)=.867 are
    above the .38 threshold, cos(v8,v10)=.0195 and every cos(seed0, v*)
    (<=.196) are below. One-shot dominance: v9 is dropped (dominated by v8)
    and v10 is dropped TOO, although its only dominator v9 is itself dropped
    — the documented chain semantics, more aggressive than the paper's
    greedy. The seeds and v8 survive."""
    dim = 16
    vecs = [np.eye(dim)[i] for i in range(8)]  # seeds: one cell each
    v8 = np.zeros(dim); v8[0] = 0.2; v8[8] = 1.0
    v9 = np.zeros(dim); v9[0] = 0.15; v9[8] = 0.5; v9[9] = np.sqrt(0.75)
    v10 = np.zeros(dim); v10[0] = 0.1; v10[9] = 1.0
    sf = _write_emb(tmp_path, vecs + [v8, v9, v10])
    got = _to_df(sim.q_semdedup_keep(sf)).set_index("vec_id")
    assert (got.loc[8:10, "cell"] == 0).all()
    assert got["keep"].to_dict() == {
        **{i: True for i in range(9)}, 9: False, 10: False
    }
    # the DuckDB mirror agrees on the planted fixture, not just the driver sf
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'embeddings.parquet')}')"
    )
    exp = _canon(con.execute(e.oracle_sql()["dedup_semantic_keep"]).df())
    pd.testing.assert_frame_equal(
        _canon(got.reset_index()), exp, check_dtype=False, check_exact=True
    )


def test_semdedup_cell_cap_fails_fast():
    """An oversized cell group must refuse, naming the knobs (the all-one-
    cluster degenerate corpus), instead of materializing an unbounded
    pairwise block."""
    n = 10
    grp = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "cell": pa.array([0] * n, pa.int64()),
            "score": pa.array([1.0] * n, pa.float64()),
            "embedding": pa.array(
                [[1.0, 0.0]] * n, pa.list_(pa.float32())
            ),
        }
    )
    with pytest.raises(ValueError, match="IVF_CELLS"):
        sim._semdedup_cell_group(grp, _cap=5)


def test_semdedup_row_block_invariance(ray_session):
    """The blocked pairwise loop is a pure memory bound: shrinking the block
    to 7 (forcing many partial blocks at sf0.001 cell sizes) cannot change
    the result."""
    import pyarrow.parquet as _pq

    full = _pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids, mat = sim._batch_matrix(full)
    cn = sim._ivf_centroids(SF_DIR)
    cells, scores = sim._assign_cells(mat, cn)
    m = cells == cells[0]
    grp = pa.table(
        {
            "vec_id": pa.array(ids[m], pa.int64()),
            "cell": pa.array(cells[m], pa.int64()),
            "score": pa.array(scores[m], pa.float64()),
            "embedding": pa.array(
                [r.tolist() for r in mat[m]], pa.list_(pa.float32())
            ),
        }
    )
    base = sim._semdedup_cell_group(grp)
    old = sim.SEMDEDUP_ROW_BLOCK
    try:
        sim.SEMDEDUP_ROW_BLOCK = 7
        small = sim._semdedup_cell_group(grp)
    finally:
        sim.SEMDEDUP_ROW_BLOCK = old
    assert base.equals(small)
