"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (documented per-op):

* exact: hash inside map_batches -> two-phase groupby(hash) keeping
  min(doc_id) — only (hash, id, count) partials shuffle, never documents.
* MinHash+LSH: shingle -> 64-perm minhash (vectorized universal hashing) ->
  band buckets via flat-map -> groupby(band, bucket) -> candidate pairs ->
  exact-Jaccard verification. At 100 TB the verification joins signatures
  back by doc_id (hash-partitioned); at test scale the shingle sets are
  broadcast.
* SimHash: 64-bit signature; near-dup candidates = equality on any of four
  16-bit chunks (Hamming<=3 guarantee across chunks).
* n-gram Jaccard: exact pairwise over word sets — the O(n^2) oracle
  baseline; LSH above is the scale path.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from ..rayenv import remote_kwargs
from ..stages.aggregate import counts_table

_MERSENNE = (1 << 61) - 1
NUM_PERM = 64
NUM_BANDS = 8  # 8 rows per band
SHINGLE_K = 3  # word 3-grams

_rng = np.random.RandomState(1234567)
_A = _rng.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64)
_B = _rng.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64)


def _md5_64(s: str) -> int:
    # 63-bit so values stay inside int64 for numpy vector math
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") & ((1 << 63) - 1)


def word_shingles(text: str, k: int = SHINGLE_K) -> set[int]:
    words = text.split()
    if len(words) < k:
        return {_md5_64(" ".join(words))} if words else set()
    return {_md5_64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}


def minhash_signature(shingles: set[int]) -> np.ndarray:
    """64 minima of universal hashes h_i(x) = (a_i * x + b_i) mod p."""
    if not shingles:
        return np.full(NUM_PERM, _MERSENNE, dtype=np.int64)
    x = np.fromiter(shingles, dtype=np.int64)[:, None].astype(object)
    h = (x * _A + _B) % _MERSENNE  # object dtype avoids int64 overflow
    return h.min(axis=0).astype(np.int64)


def band_keys(sig: np.ndarray) -> list[int]:
    rows = NUM_PERM // NUM_BANDS
    return [
        _md5_64(",".join(map(str, sig[b * rows : (b + 1) * rows])))
        for b in range(NUM_BANDS)
    ]


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """flat-map: one row per (doc, band) -> (band, bucket, doc_id)."""
    ids, bands, buckets = [], [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sig = minhash_signature(word_shingles(text))
        for b, key in enumerate(band_keys(sig)):
            ids.append(doc_id)
            bands.append(b)
            buckets.append(key % (1 << 62))
    return pa.table(
        {
            "band": pa.array(bands, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = _md5_64(w)
        bits = (h >> np.arange(64)) & 1
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    sigs = [simhash64(t) for t in batch.column("text").to_pylist()]
    cols = {"doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array([s - (1 << 63) for s in sigs], pa.int64())}
    for c in range(4):  # 16-bit chunks for Hamming-banding
        cols[f"chunk{c}"] = pa.array(
            [(s >> (16 * c)) & 0xFFFF for s in sigs], pa.int32()
        )
    return pa.table(cols)


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


# ---------------------------------------------------------------------------
# exact dedup (SQL-checked)
# ---------------------------------------------------------------------------

def exact_hash_batch(batch: pa.Table) -> pa.Table:
    hashes = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {"h": pa.array(hashes, pa.string()), "doc_id": batch.column("doc_id")}
    )


def q_exact_dedup(sf_dir: str):
    """Surviving doc per distinct text + duplicate count (hash-partitioned,
    per-group first by min doc_id)."""
    import ray.data
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir).map_batches(
        exact_hash_batch, batch_format="pyarrow", **remote_kwargs()
    )
    agg = ds.groupby("h").aggregate(Min("doc_id"), Count())
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tbl = tbl.rename_columns(["h", "keep_id", "dup_count"])
    return tbl.sort_by([("h", "ascending")])


_EXACT_DEDUP_SQL = (
    "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_count"
    " FROM documents GROUP BY 1 ORDER BY 1"
)


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard pairs (SQL-checked at small scale)
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.8


def q_jaccard_pairs(sf_dir: str):
    """Exact pairwise word-set Jaccard >= threshold. Broadcast word sets via
    ray.put; each task scores a slice of the pair space. O(n^2) baseline —
    the MinHash-LSH query is the scale path."""
    import ray
    import ray.data

    docs = pa.Table.from_pandas(_docs(sf_dir).to_pandas(), preserve_index=False)
    ids = docs.column("doc_id").to_pylist()
    sets = [frozenset(t.split()) for t in docs.column("text").to_pylist()]
    order = np.argsort(ids)
    ids = [ids[i] for i in order]
    sets = [sets[i] for i in order]
    data_ref = ray.put((ids, sets))

    def score(block: pa.Table) -> pa.Table:
        bids, bsets = ray.get(data_ref)
        rows_a, rows_b, jacs = [], [], []
        for i in block.column("id").to_pylist():
            si = bsets[i]
            for j in range(i + 1, len(bids)):
                inter = len(si & bsets[j])
                if inter == 0:
                    continue
                jac = inter / len(si | bsets[j])
                if jac >= JACCARD_THRESHOLD:
                    rows_a.append(bids[i])
                    rows_b.append(bids[j])
                    jacs.append(round(jac, 6))
        return pa.table(
            {
                "id_a": pa.array(rows_a, pa.int64()),
                "id_b": pa.array(rows_b, pa.int64()),
                "jac": pa.array(jacs, pa.float64()),
            }
        )

    # range(...) with many blocks so the O(n^2) pair space is scored across
    # tasks (from_arrow would yield ONE block = one serial task)
    idx = ray.data.range(
        len(ids), override_num_blocks=min(64, max(4, len(ids) // 32))
    )
    return idx.map_batches(score, batch_format="pyarrow", **remote_kwargs())


# word sets via \\s+ split with empties dropped — the exact semantics of
# Python str.split() used on the Ray side (plain string_split(' ') would
# keep empty tokens on double spaces and miss tabs/newlines)
_JACCARD_SQL = f"""
WITH s AS (
  SELECT doc_id, list_distinct(list_filter(
           string_split_regex(text, '\\s+'), x -> x != '')) AS ws
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.ws, b.ws))::DOUBLE
             / len(list_distinct(a.ws || b.ws)), 6) AS jac
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
      / len(list_distinct(a.ws || b.ws)) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# MinHash-LSH + SimHash (rows-only: not SQL-expressible)
# ---------------------------------------------------------------------------

def q_minhash_buckets(sf_dir: str):
    """(band, bucket) groups with >1 member = near-dup candidate groups."""
    ds = _docs(sf_dir).map_batches(
        minhash_bands_batch, batch_format="pyarrow", **remote_kwargs()
    )
    tbl = counts_table(ds, ["band", "bucket"])
    return tbl.filter(pc.greater(tbl.column("n"), 1))


def q_minhash_near_dups(sf_dir: str):
    """Candidate pairs from LSH buckets, verified by exact Jaccard."""
    import ray

    ds = _docs(sf_dir).map_batches(
        minhash_bands_batch, batch_format="pyarrow", **remote_kwargs()
    )
    # candidates: per (band, bucket) group, all pairs (groups are tiny)
    import pandas as pd

    def pairs_of_group(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cand = (
        ds.groupby(["band", "bucket"])
        .map_groups(pairs_of_group, batch_format="pandas", **remote_kwargs())
        .to_pandas()
    )
    cand = cand.drop_duplicates().astype({"id_a": "int64", "id_b": "int64"})
    # verify with exact Jaccard (broadcast shingle sets; at 100 TB this is a
    # hash-partitioned self-join on doc_id instead)
    docs = pa.Table.from_pandas(_docs(sf_dir).to_pandas(), preserve_index=False)
    sh = {
        i: word_shingles(t)
        for i, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    keep_a, keep_b, jac = [], [], []
    for a, b in zip(cand["id_a"], cand["id_b"]):
        sa, sb = sh[int(a)], sh[int(b)]
        if not sa or not sb:
            continue
        jv = len(sa & sb) / len(sa | sb)
        if jv >= JACCARD_THRESHOLD:
            keep_a.append(int(a))
            keep_b.append(int(b))
            jac.append(round(jv, 6))
    return pa.table(
        {
            "id_a": pa.array(keep_a, pa.int64()),
            "id_b": pa.array(keep_b, pa.int64()),
            "jac": pa.array(jac, pa.float64()),
        }
    )


def q_simhash(sf_dir: str):
    return _docs(sf_dir).map_batches(
        simhash_batch, batch_format="pyarrow", **remote_kwargs()
    )


register("dedup_exact", q_exact_dedup, _EXACT_DEDUP_SQL)
register("dedup_jaccard_pairs", q_jaccard_pairs, _JACCARD_SQL)
register("dedup_minhash_buckets", q_minhash_buckets)  # rows-only
register("dedup_minhash_near_dups", q_minhash_near_dups)  # rows-only
register("dedup_simhash", q_simhash)  # rows-only
