"""Similarity search over the embeddings table (list<float> column).

* Brute-force cosine top-k — the exact baseline: queries are broadcast once
  via ray.put as a (Q, D) float64 matrix; each map_batches task computes a
  numpy matmul against its batch and emits its LOCAL top-k per query (tiny
  partials); the driver folds partials into the global top-k. Only
  Q x k x num_blocks candidate rows ever leave the workers.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket
  vectors; a query only scores its own bucket (plus Hamming-1 probes).

Scores are rounded to 6 dp with doc-id tiebreak so the DuckDB mirror
(list_cosine_similarity) ranks identically.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .entry_queries import register
from ..rayenv import remote_kwargs

TOP_K = 10
NUM_QUERIES = 5  # first NUM_QUERIES vec_ids double as the query set
LSH_PLANES = 8

_plane_rng = np.random.RandomState(987654321)


def _emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(ids), -1)
    return ids, mat


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """The NUM_QUERIES lowest vec_ids as the query set — sorted by id, never
    by parquet file order (the oracle selects WHERE vec_id < NUM_QUERIES)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids, mat = _batch_matrix(t)
    order = np.argsort(ids)[:NUM_QUERIES]
    return ids[order], mat[order]


def q_cosine_topk(sf_dir: str):
    """Exact top-k cosine neighbors for each query vector."""
    import ray

    q_ids, q_mat = _query_vectors(sf_dir)
    q_ref = ray.put((q_ids, _norm_rows(q_mat)))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qn = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        sims = _norm_rows(mat) @ qn.T  # (batch, Q)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            col = sims[:, qi]
            mask = ids != qid
            cids, csims = ids[mask], np.round(col[mask], 6)
            # local top-k by (rounded score desc, vec_id asc)
            order = np.lexsort((cids, -csims))[:TOP_K]
            out_q += [int(qid)] * len(order)
            out_n += cids[order].tolist()
            out_s += csims[order].tolist()
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        _emb(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    # fold local top-k partials into global top-k (tiny)
    partials = partials.sort_values(
        ["qid", "score", "nid"], ascending=[True, False, True], kind="stable"
    )
    top = partials.groupby("qid", sort=True).head(TOP_K).reset_index(drop=True)
    top["rank"] = top.groupby("qid").cumcount() + 1
    return pa.Table.from_pandas(
        top[["qid", "nid", "rank", "score"]], preserve_index=False
    )


_COSINE_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings
  WHERE vec_id < {NUM_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id AS nid,
         round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6) AS score
  FROM q, embeddings e WHERE e.vec_id != q.qid),
ranked AS (
  SELECT qid, nid, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
  FROM scored)
SELECT qid, nid, rank, score FROM ranked WHERE rank <= {TOP_K}
ORDER BY qid, rank
"""


def q_lsh_ann(sf_dir: str):
    """Random-hyperplane LSH buckets (rows-only check): (vec_id, bucket).

    The ANN path: queries hash to a bucket and score only that bucket's
    members — at 100 TB the buckets become the partitioning key.
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        planes = np.random.RandomState(987654321).standard_normal(
            (mat.shape[1], LSH_PLANES)
        )
        bits = (mat @ planes) > 0
        bucket = (bits * (1 << np.arange(LSH_PLANES))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    return _emb(sf_dir).map_batches(
        bucketize, batch_format="pyarrow", **remote_kwargs()
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (dedup family) — exact, SQL-checked
# ---------------------------------------------------------------------------

NEARDUP_THRESHOLD = 0.38  # chosen so the synthetic tables yield 100-2000 pairs


def q_embedding_neardup(sf_dir: str):
    """All pairs (id_a < id_b) with cosine >= threshold — exact near-dup.

    The normalized full matrix is broadcast ONCE via ray.put (the embeddings
    table is the small side at test scale); each map_batches task scores its
    block against it, so only qualifying pairs leave workers. At 100 TB the
    LSH buckets (similarity_lsh_buckets) become the partitioning key and this
    exact scoring runs within buckets only.
    """
    import pyarrow.parquet as pq
    import ray

    full = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    f_ids, f_mat = _batch_matrix(full)
    ref = ray.put((f_ids, _norm_rows(f_mat)))

    def pairs(batch: pa.Table) -> pa.Table:
        bids, bn = ray.get(ref)
        aids, amat = _batch_matrix(batch)
        sims = np.round(_norm_rows(amat) @ bn.T, 6)  # (batch, N)
        ai, bj = np.nonzero((sims >= NEARDUP_THRESHOLD) & (aids[:, None] < bids[None, :]))
        return pa.table(
            {
                "id_a": pa.array(aids[ai], pa.int64()),
                "id_b": pa.array(bids[bj], pa.int64()),
                "score": pa.array(sims[ai, bj], pa.float64()),
            }
        )

    return _emb(sf_dir).map_batches(pairs, batch_format="pyarrow", **remote_kwargs())


_NEARDUP_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6)
      >= {NEARDUP_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# IVF — coarse-quantizer cells (SQL-checked) + nprobe ANN top-k (rows-only)
# ---------------------------------------------------------------------------

IVF_CELLS = 8  # centroids = the first IVF_CELLS vectors by vec_id (deterministic)
IVF_NPROBE = 2


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids, mat = _batch_matrix(t)
    order = np.argsort(ids)[:IVF_CELLS]
    return _norm_rows(mat[order])


def _assign_cells(mat: np.ndarray, cn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cell, rounded score) per row: argmax cosine, ties -> lowest cell id."""
    sims = np.round(_norm_rows(mat) @ cn.T, 6)
    cell = np.argmax(sims, axis=1).astype(np.int64)  # first max wins
    return cell, sims[np.arange(len(cell)), cell]


def q_ivf_cells(sf_dir: str):
    """IVF coarse assignment: (vec_id, cell, score). The cell is the
    partitioning key of the scale path — a 100 TB index co-locates each cell's
    vectors so a query touches only nprobe partitions."""
    import ray

    cref = ray.put(_ivf_centroids(sf_dir))

    def assign(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        cell, score = _assign_cells(mat, cn)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    return _emb(sf_dir).map_batches(assign, batch_format="pyarrow", **remote_kwargs())


_IVF_S = [
    f"round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),"
    f" CAST((SELECT embedding FROM embeddings WHERE vec_id = {i}) AS DOUBLE[])), 6)"
    for i in range(IVF_CELLS)
]
_IVF_CELL_CASE = (
    "CASE "
    + " ".join(
        f"WHEN {' AND '.join(f's{i} >= s{j}' for j in range(i + 1, IVF_CELLS))} THEN {i}"
        for i in range(IVF_CELLS - 1)
    )
    + f" ELSE {IVF_CELLS - 1} END"
)
_IVF_CELLS_SQL = (
    "WITH s AS (SELECT e.vec_id, "
    + ", ".join(f"{expr} AS s{i}" for i, expr in enumerate(_IVF_S))
    + " FROM embeddings e)"
    + f" SELECT vec_id, {_IVF_CELL_CASE} AS cell,"
    + f" greatest({', '.join(f's{i}' for i in range(IVF_CELLS))}) AS score FROM s"
)


def q_ivf_topk(sf_dir: str):
    """ANN top-k: each query probes its IVF_NPROBE nearest cells and scores
    only those cells' members (rows-only check; recall vs the exact top-k is
    asserted structurally in tests)."""
    import ray

    cn = _ivf_centroids(sf_dir)
    q_ids, q_mat = _query_vectors(sf_dir)
    qn = _norm_rows(q_mat)
    # per-query probe cells: the IVF_NPROBE highest-cosine centroids
    q_sims = np.round(qn @ cn.T, 6)
    probes = np.argsort(-q_sims, kind="stable", axis=1)[:, :IVF_NPROBE]
    ref = ray.put((q_ids, qn, probes, cn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qnn, prb, cnn = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        mn = _norm_rows(mat)
        cell, _ = _assign_cells(mat, cnn)
        sims = np.round(mn @ qnn.T, 6)  # (batch, Q)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            m = np.isin(cell, prb[qi]) & (ids != qid)
            cids, csims = ids[m], sims[m, qi]
            order = np.lexsort((cids, -csims))[:TOP_K]
            out_q += [int(qid)] * len(order)
            out_n += cids[order].tolist()
            out_s += csims[order].tolist()
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        _emb(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    partials = partials.sort_values(
        ["qid", "score", "nid"], ascending=[True, False, True], kind="stable"
    )
    top = partials.groupby("qid", sort=True).head(TOP_K).reset_index(drop=True)
    top["rank"] = top.groupby("qid").cumcount() + 1
    return pa.Table.from_pandas(
        top[["qid", "nid", "rank", "score"]], preserve_index=False
    )


register("similarity_cosine_topk", q_cosine_topk, _COSINE_SQL)
register("similarity_lsh_buckets", q_lsh_ann)  # rows-only
register("dedup_embedding_neardup", q_embedding_neardup, _NEARDUP_SQL)
register("similarity_ivf_cells", q_ivf_cells, _IVF_CELLS_SQL)
register("similarity_ivf_topk", q_ivf_topk)  # rows-only (ANN)
