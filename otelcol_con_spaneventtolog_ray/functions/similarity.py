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


def q_cosine_topk(sf_dir: str):
    """Exact top-k cosine neighbors for each query vector."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    qt = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    q_ids, q_mat = _batch_matrix(qt.slice(0, NUM_QUERIES))
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


register("similarity_cosine_topk", q_cosine_topk, _COSINE_SQL)
register("similarity_lsh_buckets", q_lsh_ann)  # rows-only
