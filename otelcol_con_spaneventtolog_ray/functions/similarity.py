"""Similarity search over the embeddings table (list<float> column).

* Brute-force cosine top-k — the exact baseline: queries are broadcast once
  via ray.put as a (Q, D) float64 matrix; each map_batches task computes a
  numpy matmul against its batch and emits its LOCAL top-k per query (tiny
  partials); the driver folds partials into the global top-k. Only
  Q x k x num_blocks candidate rows ever leave the workers.
* LSH buckets — random-hyperplane signatures; the bucket is the 100 TB
  partitioning key. Multi-table LSH also drives the embedding near-dup
  (id-only fan-out + chunk-pair pushdown verify).
* IVF — deterministic trained k-means coarse quantizer; nprobe top-k and
  the kNN self-join (cell groupby + sort-co-located segment fold).
* PQ — per-subspace k-means codebooks, 8-byte codes (32x), ADC top-k over
  CODES, and an ADC -> exact re-rank that pushdown-reads only candidates.

Scores are rounded to 6 dp with doc-id tiebreak so the DuckDB mirror
(list_cosine_similarity) ranks identically.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from ..rayenv import remote_kwargs

TOP_K = 10
NUM_QUERIES = 5  # first NUM_QUERIES vec_ids double as the query set
LSH_PLANES = 8


def _emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _unpack_matrix(batch: pa.Table, key_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(int64 key column, float64 (n, dim) embedding matrix) — THE single
    home of the parity-sensitive list<float> -> matrix unpack."""
    keys = (
        batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(keys), -1) if len(keys) else flat.reshape(0, 0)
    return keys, mat


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    return _unpack_matrix(batch, "vec_id")


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _vec_id_bounds(path: str) -> tuple[int, int]:
    """(min, max) of vec_id from parquet FOOTER statistics — no data read."""
    from ..parquet_stats import column_stats_bounds

    lo, hi = column_stats_bounds(path, "vec_id")
    return int(lo), int(hi)


def _read_id_range(path: str, lo: int, hi: int) -> pa.Table:
    """Pushdown read of vec_id in [lo, hi) — only matching row groups/rows
    leave storage."""
    import pyarrow.parquet as pq

    return pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", ">=", lo), ("vec_id", "<", hi)],
    )


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """The NUM_QUERIES lowest vec_ids as the query set — sorted by id, never
    by parquet file order (the oracle selects WHERE vec_id < NUM_QUERIES).
    Reads only the [min_id, min_id + NUM_QUERIES) id range via filter
    pushdown; falls back to a full scan only if ids are sparse there."""
    path = _emb_path(sf_dir)
    lo, hi = _vec_id_bounds(path)
    t = _read_id_range(path, lo, lo + NUM_QUERIES)
    if t.num_rows < min(NUM_QUERIES, hi - lo + 1):  # sparse ids: rare path
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["vec_id", "embedding"])
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


#: Integer quantization scale for the LSH hyperplane dot product. Both
#: engines compute floor(float64(x) * 1e6) — a single IEEE multiply + floor,
#: bit-identical in numpy and DuckDB — so the per-plane sign test is EXACT
#: integer arithmetic on both sides (|dot| <= dim * 1e6*max|x| * 9 ~ 1e8,
#: far inside the 2^53 double-exact range DuckDB's list_inner_product uses).
LSH_QUANT = 1_000_000


def _lsh_planes(dim: int) -> np.ndarray:
    """Deterministic integer-valued random hyperplanes, (dim, LSH_PLANES) in
    [-9, 9]. Integer entries (instead of Gaussians) keep the bucket function
    exactly expressible in the DuckDB oracle; for sign-hash LSH the entry
    distribution only needs symmetry, not normality."""
    return np.random.RandomState(987654321).randint(
        -9, 10, size=(dim, LSH_PLANES)
    ).astype(np.int64)


def q_lsh_ann(sf_dir: str):
    """Random-hyperplane LSH buckets (SQL-gated): (vec_id, bucket).

    The ANN path: queries hash to a bucket and score only that bucket's
    members — at 100 TB the buckets become the partitioning key.
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        q = np.floor(mat * LSH_QUANT).astype(np.int64)
        bits = (q @ _lsh_planes(mat.shape[1] if mat.size else 64)) > 0
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


def _lsh_bucket_sql(dim: int = 64) -> str:
    """Exact DuckDB mirror of q_lsh_ann for dim-wide embeddings: the integer
    plane matrix is inlined as literals, the quantization is the same
    floor(x*1e6) both engines compute."""
    planes = _lsh_planes(dim)
    terms = []
    for j in range(LSH_PLANES):
        col = ", ".join(str(int(v)) for v in planes[:, j])
        terms.append(
            f"(CASE WHEN list_inner_product(q, [{col}]::BIGINT[]) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    expr = "\n     + ".join(terms)
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {LSH_QUANT}) AS BIGINT)) AS q
  FROM embeddings)
SELECT vec_id,
       {expr} AS bucket
FROM qv ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (dedup family) — exact, SQL-checked
# ---------------------------------------------------------------------------

NEARDUP_THRESHOLD = 0.38  # chosen so the synthetic tables yield 100-2000 pairs


#: id-range chunk width for the exact all-pairs scorer: each task holds TWO
#: chunks (2 x CHUNK x D doubles), never the full matrix
NEARDUP_CHUNK_ROWS = 1024


def q_embedding_neardup(sf_dir: str):
    """All pairs (id_a < id_b) with cosine >= threshold — exact near-dup.

    Scale shape: the id space is cut into chunks from FOOTER statistics and
    every unordered chunk pair (i <= j) becomes one task that pushdown-reads
    just its two id ranges and scores them blockwise — per-task memory is
    2 x NEARDUP_CHUNK_ROWS vectors regardless of corpus size, and neither
    the driver nor any worker ever holds the full matrix. Work is inherently
    O(n^2) because the query is exact; dedup_embedding_neardup_lsh is the
    approximate path whose cost follows the bucket sizes instead.
    """
    import ray.data

    path = _emb_path(sf_dir)
    lo, hi = _vec_id_bounds(path)
    n_chunks = max(1, -(-(hi + 1 - lo) // NEARDUP_CHUNK_ROWS))
    edges = np.unique(np.linspace(lo, hi + 1, n_chunks + 1).astype(np.int64))
    tasks = [
        {
            "lo_a": int(edges[i]), "hi_a": int(edges[i + 1]),
            "lo_b": int(edges[j]), "hi_b": int(edges[j + 1]),
        }
        for i in range(len(edges) - 1)
        for j in range(i, len(edges) - 1)
    ]

    def score_pair(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for row in batch.to_pylist():
            a = _read_id_range(path, row["lo_a"], row["hi_a"])
            b = (
                a
                if (row["lo_a"], row["hi_a"]) == (row["lo_b"], row["hi_b"])
                else _read_id_range(path, row["lo_b"], row["hi_b"])
            )
            if a.num_rows == 0 or b.num_rows == 0:
                continue
            aids, amat = _batch_matrix(a)
            bids, bmat = _batch_matrix(b)
            sims = np.round(_norm_rows(amat) @ _norm_rows(bmat).T, 6)
            ai, bj = np.nonzero(
                (sims >= NEARDUP_THRESHOLD) & (aids[:, None] < bids[None, :])
            )
            out_a.append(aids[ai])
            out_b.append(bids[bj])
            out_s.append(sims[ai, bj])
        if not out_a:
            out_a, out_b, out_s = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)], [np.zeros(0)]
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return ray.data.from_items(tasks).map_batches(
        score_pair, batch_format="pyarrow", batch_size=1, **remote_kwargs()
    )


# --- approximate scale path: multi-table hyperplane LSH, id-only fan-out,
# candidate-pair dedup, then chunk-pair pushdown verify ---

NEARDUP_LSH_TABLES = 24
NEARDUP_LSH_PLANES = 3  # few planes/table at test scale; log-scale with corpus

#: cap on one (table, bucket) candidate group — a group of g emits C(g,2)
#: candidate-pair rows in ONE output block (g=5000 -> ~200 MB), so a
#: degenerate all-similar corpus must fail fast before materializing it
NEARDUP_MAX_BUCKET = 5_000

_lsh_rng_seed = 246813579


def _neardup_lsh_batch(batch: pa.Table) -> pa.Table:
    """flat-map: (table, bucket, vec_id) — T hash tables of P random
    hyperplanes each. ONLY ids fan out (14 bytes/row): the round-2 version
    shipped the embedding with every one of the 24 table rows, so 24x the
    corpus's vector bytes crossed the shuffle; vectors are now re-read once
    per chunk pair in the verify stage via filter pushdown instead."""
    ids, mat = _batch_matrix(batch)
    n = len(ids)
    rng = np.random.RandomState(_lsh_rng_seed)
    planes = rng.standard_normal(
        (NEARDUP_LSH_TABLES, mat.shape[1], NEARDUP_LSH_PLANES)
    )
    parts = []
    for t in range(NEARDUP_LSH_TABLES):
        bits = (mat @ planes[t]) > 0
        bucket = (bits * (1 << np.arange(NEARDUP_LSH_PLANES))).sum(axis=1)
        parts.append(
            pa.table(
                {
                    "table": pa.array(np.full(n, t, dtype=np.int32), pa.int32()),
                    "bucket": pa.array(bucket.astype(np.int32), pa.int32()),
                    "vec_id": pa.array(ids, pa.int64()),
                }
            )
        )
    return pa.concat_tables(parts)


def _neardup_candidate_pairs(group: pa.Table, _cap: int | None = None) -> pa.Table:
    """One (table, bucket) group -> its candidate pairs (id_a < id_b)."""
    cap = NEARDUP_MAX_BUCKET if _cap is None else _cap
    ids = np.unique(
        group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    g = len(ids)
    if g > cap:
        raise ValueError(
            f"embedding near-dup LSH bucket has {g} members (cap {cap}):"
            " a mass of near-identical vectors collapsed into one bucket,"
            " making the candidate set quadratic. Deduplicate exact copies"
            " first or raise similarity.NEARDUP_MAX_BUCKET deliberately."
        )
    if g < 2:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    ai, bj = np.triu_indices(g, k=1)
    return pa.table(
        {"id_a": pa.array(ids[ai], pa.int64()),
         "id_b": pa.array(ids[bj], pa.int64())}
    )


def _neardup_chunk_verify_fn(path: str, lo: int, chunk: int):
    """Verify one (chunk_a, chunk_b) group of candidate pairs: pushdown-read
    the two CONTIGUOUS id ranges (2 x chunk vectors max, regardless of
    corpus size — the exact path's _read_id_range shape), score the listed
    pairs from one chunk x chunk matmul, keep score >= threshold."""

    def _verify(group: pa.Table) -> pa.Table:
        a = group.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = group.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = int((a[0] - lo) // chunk)
        cb = int((b[0] - lo) // chunk)
        ta = _read_id_range(path, lo + ca * chunk, lo + (ca + 1) * chunk)
        tb = (
            ta if cb == ca
            else _read_id_range(path, lo + cb * chunk, lo + (cb + 1) * chunk)
        )
        aids, amat = _batch_matrix(ta)
        bids, bmat = _batch_matrix(tb)
        oa = np.argsort(aids, kind="stable")  # searchsorted needs sorted ids
        ob = np.argsort(bids, kind="stable")
        aids, amat = aids[oa], amat[oa]
        bids, bmat = bids[ob], bmat[ob]
        sims = np.round(_norm_rows(amat) @ _norm_rows(bmat).T, 6)
        ia = np.searchsorted(aids, a)
        ib = np.searchsorted(bids, b)
        s = sims[ia, ib]
        keep = s >= NEARDUP_THRESHOLD
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "score": pa.array(s[keep], pa.float64()),
            }
        )

    return _verify


def q_embedding_neardup_lsh(sf_dir: str):
    """Approximate near-dup pairs: candidates = pairs sharing ANY of the
    NEARDUP_LSH_TABLES buckets, exact-verified against the threshold.

    Scale shape (round-3 rework): the fan-out carries (table, bucket,
    vec_id) ONLY — the heavy exchange moves 14-byte rows, never vectors
    (previously the embedding itself was replicated into all 24 table rows).
    Candidate pairs are deduped with a tiny groupby, keyed by their
    (id_a chunk, id_b chunk) cell, and each chunk-pair group pushdown-reads
    its two contiguous id ranges to score its pairs — per-task memory is
    2 x NEARDUP_CHUNK_ROWS vectors at any corpus size, and each occupied
    chunk pair is read once. Precision is exact by construction; recall vs
    the exact query is pinned in pytest (1.0 on the sf0.01 fixture at the
    current threshold)."""
    from ..parquet_stats import file_num_rows

    path = _emb_path(sf_dir)
    if file_num_rows(path) == 0:  # footer-only check; no stats to read
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    lo, _hi = _vec_id_bounds(path)
    chunk = NEARDUP_CHUNK_ROWS
    cap = NEARDUP_MAX_BUCKET  # captured driver-side so overrides reach workers
    ds = _emb(sf_dir).map_batches(
        _neardup_lsh_batch, batch_format="pyarrow", **remote_kwargs()
    )
    cand = ds.groupby(["table", "bucket"]).map_groups(
        lambda g: _neardup_candidate_pairs(g, cap),
        batch_format="pyarrow", **remote_kwargs()
    )
    # dedup pairs found via several tables, then key by chunk cell
    uniq = cand.groupby(["id_a", "id_b"]).count()

    def chunk_keys(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ca": pa.array((a - lo) // chunk, pa.int64()),
                "cb": pa.array((b - lo) // chunk, pa.int64()),
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
            }
        )

    keyed = uniq.map_batches(chunk_keys, batch_format="pyarrow", **remote_kwargs())
    pairs = keyed.groupby(["ca", "cb"]).map_groups(
        _neardup_chunk_verify_fn(path, lo, chunk),
        batch_format="pyarrow", **remote_kwargs()
    )
    df = pairs.to_pandas()
    if len(df) == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    df = df.sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(
        df.reset_index(drop=True)[["id_a", "id_b", "score"]], preserve_index=False
    )


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

IVF_CELLS = 8  # seed centroids = the first IVF_CELLS vectors by vec_id
# nprobe=3: measured on the sf0.001 fixture (random-ish synthetic vectors, so
# cells are near-balanced either way): trained-centroid recall@10 = 0.94 vs
# 0.92 seed at nprobe=3 (0.90 seed at the old nprobe=2), scanning 37.6% of
# the corpus per query. Recall/scan tradeoff is the nprobe knob.
IVF_NPROBE = 3


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Seed centroids: the first IVF_CELLS vectors by vec_id (deterministic,
    SQL-mirrorable) — read via id-range pushdown, not a full scan."""
    path = _emb_path(sf_dir)
    lo, hi = _vec_id_bounds(path)
    t = _read_id_range(path, lo, lo + IVF_CELLS)
    if t.num_rows < min(IVF_CELLS, hi - lo + 1):  # sparse ids: rare path
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids, mat = _batch_matrix(t)
    order = np.argsort(ids)[:IVF_CELLS]
    return _norm_rows(mat[order])


IVF_TRAIN_ITERS = 4


def train_ivf_centroids(sf_dir: str, iters: int = IVF_TRAIN_ITERS) -> np.ndarray:
    """Deterministic spherical k-means as two-phase Ray aggregates.

    Init = the seed centroids (first IVF_CELLS by vec_id). Each iteration is
    one streaming pass: every batch assigns its vectors to the nearest
    centroid and emits per-cell PARTIALS (sum vector, count, min vec_id) —
    only |cells| x |blocks| tiny rows reach the driver, which folds them in
    (cell, min_id) order so float summation order is reproducible. Empty
    cells keep their previous centroid. Fixed seed + fixed iteration count +
    ordered fold => byte-deterministic centroids.
    """
    import ray

    cn = _ivf_centroids(sf_dir)

    def partials_fn(cref):
        def _partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            ids, mat = _batch_matrix(batch)
            cell, _ = _assign_cells(mat, c)
            order = np.argsort(cell, kind="stable")
            cell_s, mat_s, ids_s = cell[order], mat[order], ids[order]
            uniq, first = np.unique(cell_s, return_index=True)
            sums = np.add.reduceat(mat_s, first, axis=0)
            counts = np.diff(np.append(first, len(cell_s)))
            min_ids = np.minimum.reduceat(ids_s, first)
            return pa.table(
                {
                    "cell": pa.array(uniq, pa.int64()),
                    "count": pa.array(counts.astype(np.int64), pa.int64()),
                    "min_id": pa.array(min_ids, pa.int64()),
                    "sum": pa.array(
                        [r.tolist() for r in sums], pa.list_(pa.float64())
                    ),
                }
            )

        return _partials

    for _ in range(iters):
        cref = ray.put(cn)
        parts = (
            _emb(sf_dir)
            .map_batches(partials_fn(cref), batch_format="pyarrow", **remote_kwargs())
            .to_pandas()
        )
        parts = parts.sort_values(["cell", "min_id"], kind="stable")
        new = cn.copy()
        for cell, grp in parts.groupby("cell", sort=True):
            total = np.zeros(cn.shape[1])
            for s in grp["sum"]:
                total += np.asarray(s)
            n = int(grp["count"].sum())
            if n > 0:
                new[int(cell)] = total / n
        cn = _norm_rows(new)
    return cn


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
    """ANN top-k: each query probes its IVF_NPROBE nearest TRAINED cells
    (deterministic k-means, train_ivf_centroids) and scores only those
    cells' members (rows-only check; recall vs the exact top-k is asserted
    in tests and recorded there)."""
    import ray

    cn = train_ivf_centroids(sf_dir)
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


# ---------------------------------------------------------------------------
# kNN self-join — approximate top-k neighbors for EVERY vector, distributed:
# each vector fans out to its KNN_NPROBE nearest trained cells (the row for
# its OWN cell — always the nearest centroid — doubles as the "member" row,
# so the fan-out is x nprobe, not x(nprobe+1)); groupby(cell).map_groups
# scores the queries of a cell against its members (one matmul per cell,
# flattened lexsort top-k — no per-query Python) and emits per-cell local
# top-k partials; the final per-query fold is sort("qid") followed by a
# VECTORIZED segment fold inside map_batches (lexsort + run-boundary rank —
# one Python call per BLOCK, never per query; Ray's range-partitioned sort
# co-locates equal keys in one block, the same property map_groups relies
# on). The cell is the only partitioning key — no broadcast of the corpus,
# no driver-side matrices, O(k) rows per (query, probed cell) cross the
# second exchange.
# ---------------------------------------------------------------------------

KNN_K = 5
#: the self-join probes more cells than the query path: on weakly clustered
#: (synthetic near-uniform) data recall tracks the scanned fraction almost
#: linearly — measured on sf0.001: nprobe 3/4/5/6 -> recall .654/.764/.851/.921
KNN_NPROBE = 5


def _knn_fanout_fn(cref):
    import ray

    def _fanout(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        sims = np.round(_norm_rows(mat) @ cn.T, 6)
        probes = np.argsort(-sims, kind="stable", axis=1)[:, :KNN_NPROBE]
        # probes[:, 0] IS the own cell (argmax == first of the stable
        # descending argsort), so probe 0 carries role=2 (member AND query)
        # and the embedding ships x nprobe, not x(nprobe+1)
        parts = []
        for p in range(KNN_NPROBE):
            role = np.full(len(ids), 2 if p == 0 else 1, dtype=np.int8)
            parts.append(
                pa.table(
                    {
                        "cell": pa.array(probes[:, p].astype(np.int64), pa.int64()),
                        "role": pa.array(role, pa.int8()),
                        "vec_id": pa.array(ids, pa.int64()),
                        "embedding": emb,
                    }
                )
            )
        return pa.concat_tables(parts)

    return _fanout


def _segment_rank(keys: np.ndarray) -> np.ndarray:
    """1-based rank within each run of equal values in a SORTED key array."""
    n = len(keys)
    starts = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
    lens = np.diff(np.append(starts, n))
    return np.arange(n) - np.repeat(starts, lens) + 1


#: query-row block for the per-cell scoring matmul: bounds the (block, M)
#: sims matrix and its flattened lexsort at ~KNN_QUERY_BLOCK x cell-size
#: temporaries, so a large cell costs more BLOCKS, never more memory
KNN_QUERY_BLOCK = 2048

#: one IVF cell's fanned-in rows (members + x nprobe queries) form ONE
#: map_groups group, i.e. one block — the partitioning assumption of the
#: self-join. With cells sized ~sqrt(n) this is small, but a degenerate
#: corpus (all vectors in one cluster) concentrates everything in one cell;
#: fail fast at this bound instead of silently materializing an unbounded
#: block (round-3 "What's wrong" #4). 200k rows x (8B id + 256B f32x64
#: embedding) ~= 53 MB per group block; the scoring itself stays
#: KNN_QUERY_BLOCK-bounded regardless.
KNN_MAX_CELL_GROUP = 200_000


def _knn_cell_group(group: pa.Table, _cap: int | None = None) -> pa.Table:
    """Score a cell's queries against its members — blocked matmuls + one
    flattened lexsort per query block; the per-query local top-k comes
    from segment ranks over (qid, score desc, nid) order, no Python loop
    over queries (the loop below is per BLOCK of 2048 queries)."""
    cap = KNN_MAX_CELL_GROUP if _cap is None else _cap
    if group.num_rows > cap:
        raise ValueError(
            f"kNN self-join cell group has {group.num_rows} rows (cap"
            f" {cap}): the embedding distribution is collapsing into one"
            " IVF cell, which would materialize an unbounded block. Raise"
            " similarity.IVF_CELLS so cells stay ~sqrt(n) vectors, or raise"
            " similarity.KNN_MAX_CELL_GROUP deliberately."
        )
    roles = group.column("role").to_numpy(zero_copy_only=False)
    ids, mat = _batch_matrix(group.select(["vec_id", "embedding"]))
    nm = _norm_rows(mat)
    mem = roles != 1  # member-only (0, legacy) or member+query (2)
    qry = roles != 0  # query-only (1) or member+query (2)
    if not mem.any() or not qry.any():
        return pa.table(
            {"qid": pa.array([], pa.int64()), "nid": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    mids, qids = ids[mem], ids[qry]
    nmem = nm[mem]
    nqry = nm[qry]
    out_q, out_n, out_s = [], [], []
    for q0 in range(0, len(qids), KNN_QUERY_BLOCK):
        qb = qids[q0:q0 + KNN_QUERY_BLOCK]
        sims = np.round(nqry[q0:q0 + KNN_QUERY_BLOCK] @ nmem.T, 6)  # (B, M)
        B, M = sims.shape
        flat = sims.ravel()
        qrep = np.repeat(qb, M)
        ntile = np.tile(mids, B)
        valid = qrep != ntile  # a vector is never its own neighbor
        flat, qrep, ntile = flat[valid], qrep[valid], ntile[valid]
        order = np.lexsort((ntile, -flat, qrep))  # qid, score desc, nid asc
        qrep, ntile, flat = qrep[order], ntile[order], flat[order]
        keep = _segment_rank(qrep) <= KNN_K
        out_q.append(qrep[keep])
        out_n.append(ntile[keep])
        out_s.append(flat[keep])
    return pa.table(
        {
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "nid": pa.array(np.concatenate(out_n), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        }
    )


def _knn_fold_batch(t: pa.Table) -> pa.Table:
    """Vectorized per-query fold over one sorted block: dedupe (qid, nid)
    keeping the max score, then global top-KNN_K per qid via segment ranks.
    Runs under map_batches(batch_size=None) after sort("qid"), whose
    range-partitioned shuffle co-locates every row of a qid in one block
    (the same guarantee groupby().map_groups builds on) — so this is exact,
    with one Python call per BLOCK instead of per query."""
    qid = t.column("qid").to_numpy(zero_copy_only=False)
    nid = t.column("nid").to_numpy(zero_copy_only=False)
    score = t.column("score").to_numpy(zero_copy_only=False)
    if len(qid) == 0:
        return pa.table(
            {"qid": pa.array([], pa.int64()), "nid": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    # dedupe: a neighbor can arrive from several probed cells — sort each
    # (qid, nid) run by score desc and keep its first (max-score) row
    order = np.lexsort((-score, nid, qid))
    qid, nid, score = qid[order], nid[order], score[order]
    first = np.concatenate([[True], (qid[1:] != qid[:-1]) | (nid[1:] != nid[:-1])])
    qid, nid, score = qid[first], nid[first], score[first]
    # rank: score desc, nid asc within each qid
    order = np.lexsort((nid, -score, qid))
    qid, nid, score = qid[order], nid[order], score[order]
    rank = _segment_rank(qid)
    keep = rank <= KNN_K
    return pa.table(
        {
            "qid": pa.array(qid[keep], pa.int64()),
            "nid": pa.array(nid[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
            "score": pa.array(score[keep], pa.float64()),
        }
    )


def q_knn_join(sf_dir: str):
    """Approximate kNN for every vector (rows-only; recall vs brute force is
    pinned in tests). The final fold is sort("qid") + a segment-vectorized
    map_batches — no per-query Python anywhere in the DAG."""
    import ray

    cref = ray.put(train_ivf_centroids(sf_dir))
    fan = _emb(sf_dir).map_batches(
        _knn_fanout_fn(cref), batch_format="pyarrow", **remote_kwargs()
    )
    cap = KNN_MAX_CELL_GROUP  # captured driver-side so overrides reach workers
    partials = fan.groupby("cell").map_groups(
        lambda g: _knn_cell_group(g, cap),
        batch_format="pyarrow", **remote_kwargs()
    )
    return partials.sort("qid").map_batches(
        _knn_fold_batch, batch_format="pyarrow", batch_size=None,
        **remote_kwargs()
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN scale path: vectors are
# compressed to M uint8 codes (here 64 float32 dims -> 8 bytes, 32x), and
# queries scan CODES with per-query distance tables (ADC) instead of raw
# vectors. At 100 TB the codes table is what a scan touches; raw vectors
# are only re-read to re-rank a short candidate list (not modeled here).
# Training is the same deterministic two-phase k-means fold as the IVF
# coarse quantizer, once per subspace. All rows-only (k-means codebooks are
# not SQL-expressible); determinism, code ranges, reconstruction-error
# sanity and recall vs exact top-k are pinned in pytest.
# ---------------------------------------------------------------------------

PQ_M = 8            # subvectors (D must be divisible by PQ_M)
#: codewords per subspace, stored as uint8. 64 (6-bit) rather than the
#: classic 256: the sf0.001 training fixture has only 500 vectors, and
#: measured recall@10 vs exact is 0.22/0.44/0.52 at K=16/64/256 on its
#: near-uniform synthetic embeddings — 64 balances recall against
#: training degeneracy; at real corpus scale raise to 256.
PQ_K = 64
PQ_TRAIN_ITERS = 4


def train_pq_codebooks(sf_dir: str, iters: int = PQ_TRAIN_ITERS) -> np.ndarray:
    """(PQ_M, PQ_K, D/PQ_M) codebooks via deterministic per-subspace
    k-means: init = the first PQ_K vectors by vec_id (sliced), then `iters`
    streaming passes emitting per-(subspace, cell) PARTIALS (sum, count,
    min vec_id) — only PQ_M x PQ_K x blocks tiny rows reach the driver,
    folded in (subspace, cell, min_id) order for byte-determinism. Empty
    cells keep their previous codeword. Vectors are L2-normalized first so
    PQ distances rank like cosine."""
    import ray

    path = _emb_path(sf_dir)
    lo, hi = _vec_id_bounds(path)
    t = _read_id_range(path, lo, lo + PQ_K)
    if t.num_rows < min(PQ_K, hi - lo + 1):  # sparse ids: rare path
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids, mat = _batch_matrix(t)
    order = np.argsort(ids)[:PQ_K]
    seed = _norm_rows(mat[order])
    D = seed.shape[1]
    sub = D // PQ_M
    cb = np.stack([seed[:, m * sub:(m + 1) * sub] for m in range(PQ_M)])

    def partials_fn(cref):
        def _partials(batch: pa.Table) -> pa.Table:
            cbs = ray.get(cref)
            ids, mat = _batch_matrix(batch)
            nm = _norm_rows(mat)
            rows_m, rows_c, rows_n, rows_i, rows_s = [], [], [], [], []
            for m in range(PQ_M):
                x = nm[:, m * sub:(m + 1) * sub]
                d = (
                    (x ** 2).sum(axis=1, keepdims=True)
                    - 2.0 * (x @ cbs[m].T)
                    + (cbs[m] ** 2).sum(axis=1)[None, :]
                )
                cell = np.argmin(np.round(d, 9), axis=1).astype(np.int64)
                order = np.argsort(cell, kind="stable")
                cs, xs, iss = cell[order], x[order], ids[order]
                uniq, first = np.unique(cs, return_index=True)
                sums = np.add.reduceat(xs, first, axis=0)
                counts = np.diff(np.append(first, len(cs)))
                min_ids = np.minimum.reduceat(iss, first)
                rows_m.append(np.full(len(uniq), m, dtype=np.int64))
                rows_c.append(uniq)
                rows_n.append(counts.astype(np.int64))
                rows_i.append(min_ids)
                rows_s.extend(r.tolist() for r in sums)
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(rows_m), pa.int64()),
                    "cell": pa.array(np.concatenate(rows_c), pa.int64()),
                    "count": pa.array(np.concatenate(rows_n), pa.int64()),
                    "min_id": pa.array(np.concatenate(rows_i), pa.int64()),
                    "sum": pa.array(rows_s, pa.list_(pa.float64())),
                }
            )

        return _partials

    for _ in range(iters):
        cref = ray.put(cb)
        parts = (
            _emb(sf_dir)
            .map_batches(partials_fn(cref), batch_format="pyarrow", **remote_kwargs())
            .to_pandas()
        )
        parts = parts.sort_values(["sub", "cell", "min_id"], kind="stable")
        new = cb.copy()
        for (m, cell), grp in parts.groupby(["sub", "cell"], sort=True):
            total = np.zeros(sub)
            for svec in grp["sum"]:
                total += np.asarray(svec)
            n = int(grp["count"].sum())
            if n > 0:
                new[int(m)][int(cell)] = total / n
        cb = new
    return cb


def _pq_encode(nm: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, PQ_M) uint8 codes: per-subspace nearest codeword (rounded L2,
    first-min ties — deterministic). The squared distance is computed via
    the dgemm identity ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 — one BLAS
    matmul per subspace instead of an (n, K, sub) broadcast cube (measured
    ~20x on the encode-dominated ADC scan)."""
    sub = cb.shape[2]
    codes = np.empty((nm.shape[0], PQ_M), dtype=np.uint8)
    for m in range(PQ_M):
        x = nm[:, m * sub:(m + 1) * sub]
        d = (
            (x ** 2).sum(axis=1, keepdims=True)
            - 2.0 * (x @ cb[m].T)
            + (cb[m] ** 2).sum(axis=1)[None, :]
        )
        codes[:, m] = np.argmin(np.round(d, 9), axis=1)
    return codes


def q_pq_codes(sf_dir: str):
    """(vec_id, code0..code{M-1}) — the 32x-compressed representation every
    downstream ADC scan reads instead of raw vectors. Rows-only."""
    import ray

    cref = ray.put(train_pq_codebooks(sf_dir))

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        codes = _pq_encode(_norm_rows(mat), cb)
        cols = {"vec_id": pa.array(ids, pa.int64())}
        for m in range(PQ_M):
            cols[f"code{m}"] = pa.array(codes[:, m].astype(np.int32), pa.int32())
        return pa.table(cols)

    return _emb(sf_dir).map_batches(encode, batch_format="pyarrow", **remote_kwargs())


def q_pq_topk(sf_dir: str):
    """ADC top-k: each query precomputes its (PQ_M, PQ_K) distance table
    once; workers score their batch's CODES by summing M table lookups (no
    raw-vector math in the scan), emit local top-k partials, driver folds.
    Distances are L2^2 on normalized vectors (monotone in cosine).
    Rows-only; recall vs the exact cosine top-k is pinned in tests."""
    import ray

    cb = train_pq_codebooks(sf_dir)
    q_ids, q_mat = _query_vectors(sf_dir)
    qn = _norm_rows(q_mat)
    sub = cb.shape[2]
    # tables[q, m, k] = ||q_m - c_{m,k}||^2
    tables = np.stack([
        ((qn[:, m * sub:(m + 1) * sub][:, None, :] - cb[m][None, :, :]) ** 2)
        .sum(axis=2)
        for m in range(PQ_M)
    ], axis=1)
    ref = ray.put((q_ids, tables, cb))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, tbls, cbs = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        codes = _pq_encode(_norm_rows(mat), cbs)  # (n, M)
        # ADC: dist[q, i] = sum_m tbls[q, m, codes[i, m]]
        n = len(ids)
        dist = np.zeros((len(qids), n))
        for m in range(PQ_M):
            dist += tbls[:, m, codes[:, m]]
        dist = np.round(dist, 6)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = ids != qid
            cids, cd = ids[mask], dist[qi, mask]
            order = np.lexsort((cids, cd))[:TOP_K]
            out_q += [int(qid)] * len(order)
            out_n += cids[order].tolist()
            out_s += cd[order].tolist()
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "adc_dist": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        _emb(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    partials = partials.sort_values(
        ["qid", "adc_dist", "nid"], ascending=[True, True, True], kind="stable"
    )
    top = partials.groupby("qid", sort=True).head(TOP_K).reset_index(drop=True)
    top["rank"] = top.groupby("qid").cumcount() + 1
    return pa.Table.from_pandas(
        top[["qid", "nid", "rank", "adc_dist"]], preserve_index=False
    )


#: ADC candidate-list size per query before the exact re-rank pass
PQ_RERANK_CANDIDATES = 50


def q_pq_rerank(sf_dir: str):
    """The full classic PQ pipeline: ADC scans the CODES for each query's
    top PQ_RERANK_CANDIDATES (cheap, compressed-domain), then ONLY those
    candidate vectors are pushdown-read and exact-scored — at 100 TB the
    raw-vector reads are Q x candidates rows, not a scan. Output matches
    similarity_cosine_topk's schema; recall vs the exact top-k is pinned
    in tests (re-rank recovers most of the ADC sieve's ranking loss)."""
    import pyarrow.parquet as pq_

    cb = train_pq_codebooks(sf_dir)
    q_ids, q_mat = _query_vectors(sf_dir)
    qn = _norm_rows(q_mat)
    sub = cb.shape[2]
    tables = np.stack([
        ((qn[:, m * sub:(m + 1) * sub][:, None, :] - cb[m][None, :, :]) ** 2)
        .sum(axis=2)
        for m in range(PQ_M)
    ], axis=1)
    import ray

    ref = ray.put((q_ids, tables, cb))

    def local_cands(batch: pa.Table) -> pa.Table:
        qids, tbls, cbs = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        codes = _pq_encode(_norm_rows(mat), cbs)
        dist = np.zeros((len(qids), len(ids)))
        for m in range(PQ_M):
            dist += tbls[:, m, codes[:, m]]
        dist = np.round(dist, 6)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = ids != qid
            cids, cd = ids[mask], dist[qi, mask]
            order = np.lexsort((cids, cd))[:PQ_RERANK_CANDIDATES]
            out_q += [int(qid)] * len(order)
            out_n += cids[order].tolist()
            out_s += cd[order].tolist()
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "adc_dist": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        _emb(sf_dir)
        .map_batches(local_cands, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    partials = partials.sort_values(
        ["qid", "adc_dist", "nid"], kind="stable"
    )
    cands = partials.groupby("qid", sort=True).head(PQ_RERANK_CANDIDATES)
    # exact re-rank: read ONLY the candidate vectors (id pushdown)
    cand_ids = np.unique(cands["nid"].to_numpy())
    t = pq_.read_table(
        _emb_path(sf_dir),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", cand_ids.tolist())],
    )
    vids, vmat = _batch_matrix(t)
    order = np.argsort(vids, kind="stable")
    vids, vn = vids[order], _norm_rows(vmat[order])
    rows = []
    for qi, qid in enumerate(q_ids):
        nids = cands.loc[cands["qid"] == qid, "nid"].to_numpy()
        idx = np.searchsorted(vids, nids)
        scores = np.round(vn[idx] @ qn[qi], 6)
        o = np.lexsort((nids, -scores))[:TOP_K]
        for r, j in enumerate(o, start=1):
            rows.append((int(qid), int(nids[j]), r, float(scores[j])))
    import pandas as pd_

    df = pd_.DataFrame(rows, columns=["qid", "nid", "rank", "score"])
    return pa.Table.from_pandas(df, preserve_index=False)


def q_ivfpq_topk(sf_dir: str):
    """IVF-PQ ANN top-k — the billion-scale FAISS layout, composing this
    repo's two halves: each query probes its IVF_NPROBE nearest TRAINED
    cells (coarse quantizer) and ADC-scores ONLY those cells' members in
    the compressed code domain (no raw-vector math in the scan). At 100 TB
    the codes live cell-partitioned on disk, so non-probed cells are never
    read (the same storage note as ivf_topk/cosine_topk); here the scan
    masks per cell, which is the same arithmetic. Rows-only; recall vs the
    exact cosine top-k is pinned in tests between the PQ sieve's floor and
    the IVF pruning's ceiling."""
    import ray

    cn = train_ivf_centroids(sf_dir)
    cb = train_pq_codebooks(sf_dir)
    q_ids, q_mat = _query_vectors(sf_dir)
    qn = _norm_rows(q_mat)
    q_sims = np.round(qn @ cn.T, 6)
    probes = np.argsort(-q_sims, kind="stable", axis=1)[:, :IVF_NPROBE]
    sub = cb.shape[2]
    tables = np.stack([
        ((qn[:, m * sub:(m + 1) * sub][:, None, :] - cb[m][None, :, :]) ** 2)
        .sum(axis=2)
        for m in range(PQ_M)
    ], axis=1)
    ref = ray.put((q_ids, tables, cb, probes, cn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, tbls, cbs, prb, cnn = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        cell, _ = _assign_cells(mat, cnn)
        codes = _pq_encode(_norm_rows(mat), cbs)
        dist = np.zeros((len(qids), len(ids)))
        for m in range(PQ_M):
            dist += tbls[:, m, codes[:, m]]
        dist = np.round(dist, 6)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(cell, prb[qi]) & (ids != qid)
            cids, cd = ids[mask], dist[qi, mask]
            order = np.lexsort((cids, cd))[:TOP_K]
            out_q += [int(qid)] * len(order)
            out_n += cids[order].tolist()
            out_s += cd[order].tolist()
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "adc_dist": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        _emb(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    partials = partials.sort_values(
        ["qid", "adc_dist", "nid"], ascending=[True, True, True],
        kind="stable",
    )
    top = partials.groupby("qid", sort=True).head(TOP_K).reset_index(drop=True)
    top["rank"] = top.groupby("qid").cumcount() + 1
    return pa.Table.from_pandas(
        top[["qid", "nid", "rank", "adc_dist"]], preserve_index=False
    )


register("similarity_pq_codes", q_pq_codes)  # rows-only (k-means codes)
register("similarity_pq_topk", q_pq_topk)  # rows-only (ADC ANN)
register("similarity_pq_rerank", q_pq_rerank)  # rows-only (ADC + exact rerank)
register("similarity_ivfpq_topk", q_ivfpq_topk)  # rows-only (IVF-PQ ANN)
register("similarity_knn_join", q_knn_join)  # rows-only (ANN self-join)
register("similarity_cosine_topk", q_cosine_topk, _COSINE_SQL)
# SQL-gated since round 5: integer-quantized hyperplanes make the bucket
# function exact on both engines (see _lsh_bucket_sql).
register("similarity_lsh_buckets", q_lsh_ann, _lsh_bucket_sql())
register("dedup_embedding_neardup", q_embedding_neardup, _NEARDUP_SQL)
def _neardup_lsh_sql() -> str:
    """Exact DuckDB mirror of q_embedding_neardup_lsh (SQL-gated since
    round 5). The fixed-seed float64 hyperplanes are inlined as full-
    precision DOUBLE[] literals (repr round-trips exactly), so both engines
    hash with the SAME planes: bucket bit = list_dot_product(x, w) > 0,
    candidates = pairs sharing any (table, bucket), verify = the
    dedup_embedding_neardup cosine idiom whose gate is already green.
    Residual risk is a sign flip on a dot within ~1e-15 of zero (BLAS vs
    sequential fold order) — with O(10^6) dots of magnitude ~8 on the fixed
    gate tables this is testable, not probabilistic: gatecheck green ⇒
    driver green. Assumes the 64-dim embedding layout of the driver tables
    (the plane stream is drawn at that shape)."""
    rng = np.random.RandomState(_lsh_rng_seed)
    planes = rng.standard_normal((NEARDUP_LSH_TABLES, 64, NEARDUP_LSH_PLANES))
    rows = []
    for t in range(NEARDUP_LSH_TABLES):
        for p in range(NEARDUP_LSH_PLANES):
            w = ", ".join(repr(float(x)) for x in planes[t, :, p])
            rows.append(f"({t}, {p}, [{w}]::DOUBLE[])")
    pl = ",\n".join(rows)
    cos = ("list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), "
           "CAST(eb.embedding AS DOUBLE[]))")
    return f"""
WITH
pl AS (SELECT * FROM (VALUES
{pl}) v(t, p, w)),
bits AS (
  SELECT e.vec_id, pl.t, pl.p,
         CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.w) > 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e, pl),
bk AS (SELECT vec_id, t, SUM(bit * (1 << p)) AS bucket FROM bits GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
                      AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b, round({cos}, 6) AS score
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE round({cos}, 6) >= {NEARDUP_THRESHOLD}
ORDER BY 1, 2
"""


# SQL-gated since round 5: same planes both engines (inlined literals) +
# the already-green cosine verify (see _neardup_lsh_sql).
register("dedup_embedding_neardup_lsh", q_embedding_neardup_lsh,
         _neardup_lsh_sql())
register("similarity_ivf_cells", q_ivf_cells, _IVF_CELLS_SQL)
register("similarity_ivf_topk", q_ivf_topk)  # rows-only (ANN)


def embedding_lsh_exchange_stats(sf_dir: str) -> dict:
    """Measure the embedding-LSH fan-out exchange, don't estimate it:
    materialize the id-only (table, bucket, vec_id) dataset — the exact
    input `q_embedding_neardup_lsh` feeds its heavy groupby — and report
    its Arrow bytes, alongside what the round-2 shape (the float32 vector
    replicated onto each of its NEARDUP_LSH_TABLES rows) would have
    shipped. Companion of dedup.minhash_exchange_stats; both feed bench.py
    so the multi-node byte trade is a per-round recorded artifact."""
    fan = _emb(sf_dir).map_batches(
        _neardup_lsh_batch, batch_format="pyarrow", **remote_kwargs()
    ).materialize()
    id_only_bytes = int(fan.size_bytes())
    n_rows = int(fan.count())

    def vec_bytes(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        nfloats = len(emb.flatten())
        return pa.table(
            {"b": pa.array([nfloats * 4 * NEARDUP_LSH_TABLES], pa.int64())}
        )

    r2 = int(
        _emb(sf_dir)
        .map_batches(vec_bytes, batch_format="pyarrow", **remote_kwargs())
        .sum("b")
        or 0
    )
    return {
        "exchange_rows": n_rows,
        "exchange_bytes_id_only": id_only_bytes,
        "exchange_bytes_r2_shape": id_only_bytes + r2,
        "exchange_bytes_ratio": round((id_only_bytes + r2) / id_only_bytes, 1)
        if id_only_bytes
        else None,
    }


# ---------------------------------------------------------------------------
# per-label embedding centroids — the class-prototype aggregate behind
# nearest-class-mean classification, cluster drift monitoring and per-label
# ANN routing. Per-block combiner packs one row per (label, dim) with an
# INTEGER sum of floor-quantized micro-units (floor, not round: floor has no
# tie-breaking rule to diverge between engines, where round-half-even vs
# round-half-away could), so the distributed groupby sum is exact int64
# arithmetic in any fold order and the final mean is one float division —
# bit-identical to the DuckDB mirror. Only |labels| x dim x |blocks| rows
# cross the exchange, never vectors.

CENTROID_MICRO = 1_000_000


def _centroid_partials(batch: pa.Table) -> pa.Table:
    labels, mat = _unpack_matrix(batch, "label")
    n = len(labels)
    if n == 0:
        return pa.table(
            {"label": pa.array([], pa.int64()),
             "dim": pa.array([], pa.int64()),
             "s_q": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    d = mat.shape[1]
    q = np.floor(mat * CENTROID_MICRO).astype(np.int64)
    order = np.argsort(labels, kind="stable")
    l_s = labels[order]
    first = np.flatnonzero(np.concatenate([[True], l_s[1:] != l_s[:-1]]))
    sums = np.add.reduceat(q[order], first, axis=0)  # (groups, dim)
    counts = np.diff(np.append(first, n)).astype(np.int64)
    g = len(first)
    return pa.table(
        {
            "label": pa.array(np.repeat(l_s[first], d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), g),
                            pa.int64()),
            "s_q": pa.array(sums.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(counts, d), pa.int64()),
        }
    )


def _centroid_df(sf_dir: str):
    """Sorted (label, dim, s_q, n, mean) pandas frame — THE single home of
    the parity-critical centroid arithmetic, shared by q_label_centroids
    and the nearest-centroid quantizer so the contract cannot drift between
    them. NO final rounding on mean: with integer micro sums, exact
    .5-at-6dp ties are common and np.round (half-even) vs SQL round
    (half-away) would diverge; one IEEE float64 division of identical int64
    inputs is bit-identical across engines instead."""
    import ray.data
    from ray.data.aggregate import Sum

    df = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["label", "embedding"],
        )
        .map_batches(_centroid_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["label", "dim"])
        .aggregate(Sum("s_q"), Sum("n"))
        .to_pandas()  # O(|labels| x dim)
    )
    if len(df) == 0:
        return df
    df = df.rename(columns={"sum(s_q)": "s_q", "sum(n)": "n"})
    df["mean"] = df["s_q"].to_numpy(np.float64) / (
        df["n"].to_numpy(np.float64) * float(CENTROID_MICRO)
    )
    return df.sort_values(["label", "dim"]).reset_index(drop=True)


def q_label_centroids(sf_dir: str):
    """(label, dim, n, mean) — per-label per-dimension centroid over the
    embeddings table. dim is 1-based to match SQL generate_subscripts."""
    df = _centroid_df(sf_dir)
    if len(df) == 0:
        return pa.table(
            {"label": pa.array([], pa.int64()),
             "dim": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()),
             "mean": pa.array([], pa.float64())}
        )
    return pa.Table.from_pandas(
        df[["label", "dim", "n", "mean"]], preserve_index=False
    )


_CENTROID_SQL = f"""
SELECT label, dim, count(*) AS n,
       sum(CAST(floor(CAST(v AS DOUBLE) * {CENTROID_MICRO}) AS BIGINT))
         / (count(*) * {CENTROID_MICRO}.0) AS mean
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings)
GROUP BY 1, 2 ORDER BY 1, 2
"""

register("similarity_label_centroids", q_label_centroids, _CENTROID_SQL)


# ---------------------------------------------------------------------------
# nearest-centroid assignment — the classification/pseudo-labeling pass over
# the centroids above: every vector gets the label of its nearest centroid
# by squared L2 distance. Both the vector and the centroid are
# floor-quantized to micro-units, so dist2 = sum((qv - qc)^2) is EXACT int64
# arithmetic in both engines (64 dims x (4e6)^2 ~ 1e15 << 2^63) and the
# argmin (tie -> smaller label) cannot drift. Distributed shape: the tiny
# (labels x dim) centroid table folds first and broadcasts via ray.put; the
# assignment is one map_batches over the vectors — no shuffle carries them.

def _centroid_micro_table(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(labels sorted asc, qc int64[labels, dim]) — micro-quantized
    centroids from the SHARED _centroid_df arithmetic, matching the SQL
    mirror's qc = floor((s_q / (n * 1e6)) * 1e6)."""
    df = _centroid_df(sf_dir)
    if len(df) == 0:
        return np.zeros(0, np.int64), np.zeros((0, 0), np.int64)
    labels = np.unique(df["label"].to_numpy(np.int64))
    d = int(df["dim"].max())
    qc = (
        np.floor(df["mean"].to_numpy(np.float64) * CENTROID_MICRO)
        .astype(np.int64).reshape(len(labels), d)
    )
    return labels, qc


def _nearest_micro(mat: np.ndarray, qc: np.ndarray):
    """(argmin index per row, full int64 dist2 matrix) — THE shared
    exact-distance kernel of nearest-centroid and the confusion matrix:
    floor-quantize the vectors, one exact int64 squared-L2 per centroid
    (a vectorized C loop over n x dim per label; labels are few), argmin
    with first-minimum = smallest label (qc rows are label-sorted)."""
    qv = np.floor(mat * CENTROID_MICRO).astype(np.int64)
    d2 = np.empty((mat.shape[0], qc.shape[0]), dtype=np.int64)
    for j in range(qc.shape[0]):
        diff = qv - qc[j]
        d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    return np.argmin(d2, axis=1), d2


def q_nearest_centroid(sf_dir: str):
    """(vec_id, label, dist2) — nearest centroid per vector; dist2 in
    squared micro-units (exact int64)."""
    import ray

    labels, qc = _centroid_micro_table(sf_dir)
    if len(labels) == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "label": pa.array([], pa.int64()),
             "dist2": pa.array([], pa.int64())}
        )
    cent_ref = ray.put((labels, qc))

    def _assign(batch: pa.Table) -> pa.Table:
        labels, qc = ray.get(cent_ref)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64()),
                 "dist2": pa.array([], pa.int64())}
            )
        best, d2 = _nearest_micro(mat, qc)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "label": pa.array(labels[best], pa.int64()),
                "dist2": pa.array(d2[np.arange(len(ids)), best], pa.int64()),
            }
        )

    return _emb(sf_dir).map_batches(
        _assign, batch_format="pyarrow", **remote_kwargs()
    )


_NEAREST_SQL = f"""
WITH u AS (
  SELECT vec_id, label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings),
q AS (
  SELECT vec_id, dim,
         CAST(floor(CAST(v AS DOUBLE) * {CENTROID_MICRO}) AS BIGINT) AS qv
  FROM u),
cs AS (
  SELECT label, dim,
         sum(CAST(floor(CAST(v AS DOUBLE) * {CENTROID_MICRO}) AS BIGINT))
           AS s_q,
         count(*) AS n
  FROM u GROUP BY 1, 2),
c AS (
  SELECT label, dim,
         CAST(floor((s_q / (n * {CENTROID_MICRO}.0)) * {CENTROID_MICRO})
              AS BIGINT) AS qc
  FROM cs),
d AS (
  SELECT q.vec_id, c.label,
         sum((q.qv - c.qc) * (q.qv - c.qc)) AS dist2
  FROM q JOIN c USING (dim) GROUP BY 1, 2),
r AS (
  SELECT vec_id, label, dist2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist2, label) AS rn
  FROM d)
SELECT vec_id, label, CAST(dist2 AS BIGINT) AS dist2
FROM r WHERE rn = 1 ORDER BY vec_id
"""

register("similarity_nearest_centroid", q_nearest_centroid, _NEAREST_SQL)


def q_centroid_confusion(sf_dir: str):
    """(true_label, assigned_label, n) — the confusion matrix of the
    nearest-centroid classifier against the embeddings' own labels: the
    standard pseudo-labeling quality check. Same broadcast-prototypes /
    no-vector-shuffle shape as q_nearest_centroid; only the tiny
    (labels^2) count table leaves the workers."""
    import ray

    from ..stages.aggregate import counts_by

    labels, qc = _centroid_micro_table(sf_dir)
    if len(labels) == 0:
        return pa.table(
            {"true_label": pa.array([], pa.int64()),
             "assigned_label": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    cent_ref = ray.put((labels, qc))

    def _assign(batch: pa.Table) -> pa.Table:
        labels, qc = ray.get(cent_ref)
        true_lab, mat = _unpack_matrix(batch, "label")
        if len(true_lab) == 0:
            return pa.table(
                {"true_label": pa.array([], pa.int64()),
                 "assigned_label": pa.array([], pa.int64())}
            )
        best, _d2 = _nearest_micro(mat, qc)
        return pa.table(
            {
                "true_label": pa.array(true_lab, pa.int64()),
                "assigned_label": pa.array(labels[best], pa.int64()),
            }
        )

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label", "embedding"],
    ).map_batches(_assign, batch_format="pyarrow", **remote_kwargs())
    df = counts_by(ds, ["true_label", "assigned_label"]).to_pandas()
    df = df.sort_values(["true_label", "assigned_label"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["true_label", "assigned_label", "n"]], preserve_index=False
    )


_CONFUSION_SQL = f"""
WITH assigned AS ({_NEAREST_SQL})
SELECT e.label AS true_label, a.label AS assigned_label, count(*) AS n
FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id
GROUP BY 1, 2 ORDER BY 1, 2
"""

register("similarity_centroid_confusion", q_centroid_confusion, _CONFUSION_SQL)


# ---------------------------------------------------------------------------
# cross-TABLE fact-fact join — documents ⋈ embeddings on doc_id = vec_id.
# Every other op reads one fact table (+ broadcast dims); this is the
# text-embedding alignment report a multimodal corpus needs: per (lang,
# label) cohort, how long are the docs and how big are their vectors. Both
# sides pre-reduce inside map_batches to the 3-4 columns that join (id,
# lang, n_chars / id, label, norm2), the exchange is one sentinel-guarded
# hash join, and the post-join aggregate folds exact integers (norm² in
# micros — the similarity_norm_quantiles contract — and n_chars as-is), so
# the averages divide once per cohort and cannot drift vs the mirror.
# ---------------------------------------------------------------------------


def q_doc_embedding_join(sf_dir: str):
    """(lang, label, n_docs, avg_chars, avg_norm2): per-cohort text-length
    and embedding-norm² averages from the documents ⋈ embeddings join."""
    import ray.data
    from ray.data.aggregate import Sum

    from .blockutil import retype_block
    from .relutil import _q3_join_sentinels

    def doc_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
             "lang": batch.column("lang"),
             "n_chars": pc.cast(batch.column("n_chars"), pa.int64())}
        )

    def emb_side(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if batch.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64()),
                 "norm2_micro": pa.array([], pa.int64())}
            )
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = np.asarray(col.offsets)
        q = np.rint(flat * flat * 1_000_000).astype(np.int64)
        norm2 = np.add.reduceat(q, offs[:-1]) if len(flat) else np.zeros(
            batch.num_rows, np.int64
        )
        if len(flat):
            norm2[offs[:-1] == offs[1:]] = 0
        return pa.table(
            {"vec_id": pc.cast(batch.column("vec_id"), pa.int64()),
             "label": pc.cast(batch.column("label"), pa.int64()),
             "norm2_micro": pa.array(norm2, pa.int64())}
        )

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    ).map_batches(doc_side, batch_format="pyarrow", **remote_kwargs())
    embs = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label", "embedding"],
    ).map_batches(emb_side, batch_format="pyarrow", **remote_kwargs())
    num_partitions = 8
    sent = _q3_join_sentinels(num_partitions)
    docs = docs.union(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(sent, pa.int64()),
         "lang": pa.array([""] * len(sent), pa.string()),
         "n_chars": pa.array([0] * len(sent), pa.int64())}
    )))
    embs = embs.union(ray.data.from_arrow(pa.table(
        {"vec_id": pa.array(sent, pa.int64()),
         "label": pa.array([-1] * len(sent), pa.int64()),
         "norm2_micro": pa.array([0] * len(sent), pa.int64())}
    )))
    joined = docs.join(
        embs, join_type="inner", num_partitions=num_partitions,
        on=("doc_id",), right_on=("vec_id",),
    )

    def post_join(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids >= 0
        if not keep.all():
            t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "label": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "chars": pa.array([], pa.int64()),
                 "norm2": pa.array([], pa.int64())}
            )
        lang = t.column("lang").to_numpy(zero_copy_only=False).astype(str)
        label = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        chars = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        nm = t.column("norm2_micro").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((label, lang))
        lang_s, lab_s = lang[order], label[order]
        boundary = (lang_s[1:] != lang_s[:-1]) | (lab_s[1:] != lab_s[:-1])
        first = np.flatnonzero(np.concatenate([[True], boundary]))
        return pa.table(
            {"lang": pa.array(lang_s[first], pa.string()),
             "label": pa.array(lab_s[first], pa.int64()),
             "n": pa.array(
                 np.diff(np.append(first, len(lang_s))).astype(np.int64),
                 pa.int64()),
             "chars": pa.array(np.add.reduceat(chars[order], first), pa.int64()),
             "norm2": pa.array(np.add.reduceat(nm[order], first), pa.int64())}
        )

    df = (
        joined.map_batches(post_join, batch_format="pyarrow",
                           **remote_kwargs())
        .groupby(["lang", "label"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("chars", alias_name="chars"),
            Sum("norm2", alias_name="norm2"),
        )
        .map_batches(
            lambda t: retype_block(
                t,
                {"lang": ("lang", pa.string()),
                 "label": ("label", pa.int64()),
                 "n": ("n", pa.int64()),
                 "chars": ("chars", pa.int64()),
                 "norm2": ("norm2", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"lang": pa.array([], pa.string()),
             "label": pa.array([], pa.int64()),
             "n_docs": pa.array([], pa.int64()),
             "avg_chars": pa.array([], pa.float64()),
             "avg_norm2": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"n": "n_docs"})
    # averages as HALF-UP integer micros (numpy .round is half-even, DuckDB
    # round() is half-away — a cohort landing exactly on .5e-6 diverges, one
    # did at sf0.01). Python ints: no int64 overflow on the 2e6x products.
    df["avg_chars"] = [
        ((2 * int(c) * 1_000_000 + int(n)) // (2 * int(n))) / 1e6
        for c, n in zip(df["chars"], df["n_docs"])
    ]
    df["avg_norm2"] = [
        ((2 * int(m) + int(n)) // (2 * int(n))) / 1e6
        for m, n in zip(df["norm2"], df["n_docs"])
    ]
    df = df.sort_values(["lang", "label"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["lang", "label", "n_docs", "avg_chars", "avg_norm2"]],
        preserve_index=False,
    )


_DOC_EMB_JOIN_SQL = """
WITH j AS (
  SELECT d.lang, CAST(e.label AS BIGINT) AS label,
         CAST(d.n_chars AS BIGINT) AS n_chars,
         COALESCE(CAST(list_sum(list_transform(e.embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000)
                AS BIGINT))) AS BIGINT), 0) AS norm2_micro
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
SELECT lang, label, count(*) AS n_docs,
       CAST((2 * sum(n_chars) * 1000000 + count(*))
            // (2 * count(*)) AS BIGINT) / 1e6 AS avg_chars,
       CAST((2 * sum(norm2_micro) + count(*))
            // (2 * count(*)) AS BIGINT) / 1e6 AS avg_norm2
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""

register("similarity_doc_embedding_join", q_doc_embedding_join,
         _DOC_EMB_JOIN_SQL)


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup inside coarse cells (SQL-checked)
# ---------------------------------------------------------------------------
# Semantic deduplication in the SemDeDup shape (Abbas et al. 2023,
# arXiv:2303.09540): cluster the embedding space coarsely, then inside each
# cluster drop every vector that has a semantic near-duplicate which is MORE
# CENTRAL (closer to the cluster centroid). Our keep rule is the one-shot
# dominance variant — deterministic and fully vectorizable, unlike the
# paper's order-sequential greedy:
#
#   drop i  <=>  exists j in cell(i), j != i, with
#                round(cos(i, j), 6) >= SEMDEDUP_THRESHOLD and
#                (score_j > score_i  or  (score_j == score_i and j < i))
#
# where score is the rounded cosine to the cell's centroid (the ivf_cells
# score column). The most-central vector of any near-dup neighborhood is
# never dominated, so every semantic cluster keeps at least one
# representative; a dominance CHAIN (a~b~c, a !~ c, centrality c > b > a)
# drops BOTH a and b — slightly more aggressive than the greedy, which is
# the documented, tested semantics. Cells come from the SEED centroids
# (first IVF_CELLS by vec_id), exactly like similarity_ivf_cells, so the
# whole query is SQL-expressible and hash-gated; trained k-means centroids
# (train_ivf_centroids) remain the quality path for the ANN queries.
#
# Scale shape: each row ships through ONE shuffle keyed by cell (no
# fan-out multiplier — contrast the LSH near-dup's multi-table fan-out);
# the per-cell group is one block, capped at SEMDEDUP_MAX_CELL like the kNN
# self-join, and the pairwise cosine inside a cell is row-blocked
# (SEMDEDUP_ROW_BLOCK x cell-size temporaries), so a big cell costs more
# blocks, never more memory. At 100 TB the corpus would be stored
# cell-partitioned (the ivf_cells layout) and this groupby becomes a
# per-partition map with no shuffle at all.

SEMDEDUP_THRESHOLD = 0.38  # the neardup band: synthetic tables yield drops
SEMDEDUP_ROW_BLOCK = 2048
SEMDEDUP_MAX_CELL = 200_000


def _semdedup_cell_group(group: pa.Table, _cap: int | None = None) -> pa.Table:
    """keep/drop one cell: blocked pairwise cosine + dominance mask."""
    cap = SEMDEDUP_MAX_CELL if _cap is None else _cap
    if group.num_rows > cap:
        raise ValueError(
            f"SemDeDup cell group has {group.num_rows} rows (cap {cap}):"
            " the embedding distribution is collapsing into one cell, which"
            " would materialize an unbounded block. Raise similarity."
            "IVF_CELLS so cells stay ~sqrt(n) vectors, or raise"
            " similarity.SEMDEDUP_MAX_CELL deliberately."
        )
    ids, mat = _batch_matrix(group.select(["vec_id", "embedding"]))
    score = group.column("score").to_numpy(zero_copy_only=False)
    cell = group.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    nm = _norm_rows(mat)
    keep = np.ones(len(ids), dtype=bool)
    for b0 in range(0, len(ids), SEMDEDUP_ROW_BLOCK):
        sl = slice(b0, b0 + SEMDEDUP_ROW_BLOCK)
        sims = np.round(nm[sl] @ nm.T, 6)  # (block, cell)
        better = (score[None, :] > score[sl, None]) | (
            (score[None, :] == score[sl, None])
            & (ids[None, :] < ids[sl, None])
        )  # self is never "better": equal score and equal id both fail
        keep[sl] = ~((sims >= SEMDEDUP_THRESHOLD) & better).any(axis=1)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cell": pa.array(cell, pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def semdedup_keep_ds(sf_dir: str):
    """LIBRARY form of the semantic-dedup keep set: a streaming Dataset of
    (vec_id, cell, keep) — the whole computation is cell-partitioned and
    nothing per-doc ever lands on the driver. This is the form every
    dataset-scale consumer must use; q_semdedup_keep is only the driver-gate
    adapter (its to_pandas is the gate's return contract, O(N) rows by
    definition of the gate, not of the kernel)."""
    import ray

    cref = ray.put(_ivf_centroids(sf_dir))

    def assign(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        ids, mat = _batch_matrix(batch)
        cell, score = _assign_cells(mat, cn)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "score": pa.array(score, pa.float64()),
                "embedding": emb,
            }
        )

    return (
        _emb(sf_dir)
        .map_batches(assign, batch_format="pyarrow", **remote_kwargs())
        .groupby("cell")
        .map_groups(_semdedup_cell_group, batch_format="pyarrow",
                    **remote_kwargs())
    )


def write_semdedup_keep(sf_dir: str, out_dir: str) -> None:
    """Write the semantic-dedup keep set as CELL-partitioned parquet — the
    100-TB output contract: one directory per cell, so a failed run can
    skip finished cells and downstream consumers co-read with the
    cell-partitioned corpus; the keep-set streams from the group stage to
    storage without a driver hop."""
    semdedup_keep_ds(sf_dir).write_parquet(out_dir, partition_cols=["cell"])


def q_semdedup_keep(sf_dir: str):
    """Gate adapter: (vec_id, cell, keep), sorted by vec_id (per-doc rows
    on the driver are the GATE's contract; library path: semdedup_keep_ds /
    write_semdedup_keep)."""
    df = semdedup_keep_ds(sf_dir).to_pandas()
    df = df.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(df[["vec_id", "cell", "keep"]],
                                preserve_index=False)


_SEMDEDUP_SQL = f"""
WITH cells AS ({_IVF_CELLS_SQL}),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM cells a
  JOIN cells b ON a.cell = b.cell AND a.vec_id <> b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[])), 6)
        >= {SEMDEDUP_THRESHOLD}
    AND (b.score > a.score OR (b.score = a.score AND b.vec_id < a.vec_id))
)
SELECT c.vec_id, c.cell,
       c.vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
FROM cells c ORDER BY c.vec_id
"""

register("dedup_semantic_keep", q_semdedup_keep, _SEMDEDUP_SQL)


# ---------------------------------------------------------------------------
# MMR-diversified top-k (Carbonell & Goldstein 1998) — the retrieval
# post-processing step RAG/data-selection pipelines run after ANN: greedily
# re-rank a candidate pool balancing relevance against redundancy,
# mmr(d) = LAMBDA * sim(q, d) - (1 - LAMBDA) * max sim(d, selected).
#
# 100-TB shape: the DISTRIBUTED work is (1) the same per-block local-top-k
# candidate scan cosine_topk runs (pool partials only cross to the driver)
# and (2) ONE filtered gather of the <= Q x MMR_POOL pool vectors
# (broadcast sorted id list, searchsorted membership per block — no second
# full-matrix anything). The greedy selection itself is O(Q x k x pool)
# on the driver over a bounded pool — the part that cannot parallelize
# (each pick depends on all previous picks) stays driver-side by design.
# Rows-only query: the greedy argmax chain is not SQL-expressible; pinned
# by an exact brute-force numpy oracle test instead.
# ---------------------------------------------------------------------------

MMR_POOL = 50        # relevance candidates per query entering the re-rank
MMR_K = TOP_K        # diversified results returned per query
MMR_LAMBDA = 0.7     # relevance weight (classic default)


def q_mmr_topk(sf_dir: str):
    import ray

    q_ids, q_mat = _query_vectors(sf_dir)
    q_ref = ray.put((q_ids, _norm_rows(q_mat)))

    def local_pool(batch: pa.Table) -> pa.Table:
        qids, qn = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        sims = _norm_rows(mat) @ qn.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            col = sims[:, qi]
            mask = ids != qid
            cids, csims = ids[mask], np.round(col[mask], 6)
            order = np.lexsort((cids, -csims))[:MMR_POOL]
            out_q += [int(qid)] * len(order)
            out_n += cids[order].tolist()
            out_s += csims[order].tolist()
        return pa.table(
            {"qid": pa.array(out_q, pa.int64()),
             "nid": pa.array(out_n, pa.int64()),
             "score": pa.array(out_s, pa.float64())}
        )

    partials = (
        _emb(sf_dir)
        .map_batches(local_pool, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    if len(partials) == 0:
        return pa.table(
            {"qid": pa.array([], pa.int64()),
             "nid": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    partials = partials.sort_values(
        ["qid", "score", "nid"], ascending=[True, False, True], kind="stable"
    )
    pool = partials.groupby("qid", sort=True).head(MMR_POOL)

    # gather the pool vectors: ONE filtered scan, searchsorted membership
    want = np.unique(pool["nid"].to_numpy())
    want_ref = ray.put(want)

    def gather(batch: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        ids, mat = _batch_matrix(batch)
        pos = np.searchsorted(w, ids)
        pos[pos >= len(w)] = 0
        keep = w[pos] == ids
        sel = np.flatnonzero(keep)
        return pa.table(
            {"vec_id": pa.array(ids[sel], pa.int64()),
             "embedding": pa.array(
                 [mat[i].tolist() for i in sel],
                 pa.list_(pa.float32()))}
        )

    got = _emb(sf_dir).map_batches(
        gather, batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    vec_by_id = {
        int(r.vec_id): _norm_rows(
            np.asarray(r.embedding, np.float64)[None, :]
        )[0]
        for r in got.itertuples()
    }

    rows_q, rows_n, rows_r, rows_s = [], [], [], []
    for qid, g in pool.groupby("qid", sort=True):
        nids = g["nid"].to_numpy()
        rel = g["score"].to_numpy()  # already rounded 6dp, sorted desc
        cand = np.stack([vec_by_id[int(n)] for n in nids])
        pair = np.round(cand @ cand.T, 6)  # candidate-candidate sims
        selected: list[int] = []
        avail = np.ones(len(nids), dtype=bool)
        for rank in range(1, min(MMR_K, len(nids)) + 1):
            if selected:
                red = pair[:, selected].max(axis=1)
            else:
                red = np.zeros(len(nids))
            mmr = MMR_LAMBDA * rel - (1.0 - MMR_LAMBDA) * red
            mmr[~avail] = -np.inf
            # argmax with (mmr desc, nid asc) tie-break
            best = np.lexsort((nids, -mmr))[0]
            selected.append(int(best))
            avail[best] = False
            rows_q.append(int(qid))
            rows_n.append(int(nids[best]))
            rows_r.append(rank)
            rows_s.append(float(rel[best]))
    return pa.table(
        {"qid": pa.array(rows_q, pa.int64()),
         "nid": pa.array(rows_n, pa.int64()),
         "rank": pa.array(rows_r, pa.int64()),
         "score": pa.array(rows_s, pa.float64())}
    )


register("similarity_mmr_topk", q_mmr_topk)
