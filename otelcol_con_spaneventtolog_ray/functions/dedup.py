"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (documented per-op):

* exact: hash inside map_batches -> two-phase groupby(hash) keeping
  min(doc_id) — only (hash, id, count) partials shuffle, never documents.
* MinHash+LSH: vectorized word-shingle hashing (texthash.batch_words /
  batch_shingles — numpy over Arrow buffers, no per-row Python) -> 64-perm
  minhash via splitmix64 xor-seeds + per-doc segment minima -> band buckets
  via an ID-ONLY flat-map (20-byte rows; no shingle bytes ever shuffle) ->
  groupby(band, bucket) emits candidate pairs (capped) -> pair dedup ->
  per-(chunk_a, chunk_b) verify groups pushdown-read their two contiguous
  doc_id ranges once and recompute shingles with the same kernel for the
  exact Jaccard — only qualifying pairs ever reach the driver, and the
  documents dataset is never materialized driver-side.
* SimHash: 64-bit signature from per-word hash bit votes (vectorized
  reduceat per document); near-dup candidates = equality on any of four
  16-bit chunks (Hamming<=3 guarantee across chunks).
* n-gram Jaccard: exact pairwise over word sets — the O(n^2) oracle
  baseline, guarded by JACCARD_MAX_DOCS; MinHash-LSH above is the scale path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from .texthash import (
    BYTE_BASE,
    U64_MAX,
    _splitmix64,
    WORD_BASE,
    _splitmix64_scalar,
    batch_content_hash,
    batch_shingles,
    batch_words,
    shingle_hash_scalar,
    word_hash_scalar,
    words_scalar,
)
from ..rayenv import remote_kwargs
from ..stages.aggregate import counts_table

NUM_PERM = 64
NUM_BANDS = 8  # 8 rows per band
SHINGLE_K = 3  # word 3-grams

#: xor-seeds for the 64 "permutations" h_i(x) = splitmix64(x ^ SEED[i])
_SEEDS = _splitmix64(np.arange(1, NUM_PERM + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def word_shingles(text: str, k: int = SHINGLE_K) -> set[int]:
    """Scalar mirror of the batch shingle hashing (distinct shingle hashes)."""
    words = words_scalar(text)
    if not words:
        return set()
    whs = [word_hash_scalar(w) for w in words]
    if len(whs) < k:
        return {shingle_hash_scalar(whs)}
    return {shingle_hash_scalar(whs[i : i + k]) for i in range(len(whs) - k + 1)}


def minhash_signature(shingles: set[int]) -> np.ndarray:
    """Scalar mirror: 64 minima of splitmix64(x ^ seed_i), sentinel if empty."""
    if not shingles:
        return np.full(NUM_PERM, U64_MAX, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64)
    return np.array([_splitmix64(x ^ s).min() for s in _SEEDS], dtype=np.uint64)


def band_keys(sig: np.ndarray) -> list[int]:
    """Scalar mirror: per-band polynomial fold + splitmix64 of the signature."""
    rows = NUM_PERM // NUM_BANDS
    out = []
    for b in range(NUM_BANDS):
        h = 0
        for v in sig[b * rows : (b + 1) * rows]:
            h = (h * int(WORD_BASE) + int(v)) & ((1 << 64) - 1)
        out.append(_splitmix64_scalar(h))
    return out


def _doc_shingles(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, int]:
    """Distinct shingle hashes per doc: (values:uint64, offs:int64[n+1], n)."""
    wh, _parents, woffs = batch_words(batch.column("text"))
    sh, par = batch_shingles(wh, woffs, SHINGLE_K)
    n = batch.num_rows
    if len(sh) == 0:
        return sh, np.zeros(n + 1, dtype=np.int64), n
    # distinct within doc: sort (parent, shingle), drop consecutive equals
    order = np.lexsort((sh, par))
    sh, par = sh[order], par[order]
    keep = np.ones(len(sh), dtype=bool)
    keep[1:] = (sh[1:] != sh[:-1]) | (par[1:] != par[:-1])
    sh, par = sh[keep], par[keep]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(par, minlength=n), out=offs[1:])
    return sh, offs, n


def _minhash_sigs(sh: np.ndarray, offs: np.ndarray, n: int) -> np.ndarray:
    """(n, NUM_PERM) uint64 signatures; empty docs get the U64_MAX sentinel."""
    sig = np.full((n, NUM_PERM), U64_MAX, dtype=np.uint64)
    counts = np.diff(offs)
    present = np.flatnonzero(counts > 0)
    if len(present) == 0:
        return sig
    seg_starts = offs[present]
    for p in range(NUM_PERM):
        h = _splitmix64(sh ^ _SEEDS[p])
        sig[present, p] = np.minimum.reduceat(h, seg_starts)
    return sig


def _band_buckets(sig: np.ndarray) -> np.ndarray:
    """(n, NUM_BANDS) int64 bucket keys: polynomial fold per band + mix."""
    n = sig.shape[0]
    rows = NUM_PERM // NUM_BANDS
    out = np.empty((n, NUM_BANDS), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(NUM_BANDS):
            h = np.zeros(n, dtype=np.uint64)
            for r in range(rows):
                h = h * WORD_BASE + sig[:, b * rows + r]
            out[:, b] = _splitmix64(h)
    return out.view(np.int64)


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """flat-map: one row per (doc, band) -> (band, bucket, doc_id).

    Word-less (empty/whitespace-only) documents are dropped BEFORE the
    fan-out: they all carry the U64_MAX sentinel signature, so keeping them
    would pile every such doc into one identical giant bucket per band — a
    straggler/memory hazard and a spurious n>1 candidate group. This mirrors
    simhash_chunk_fanout's explicit word-less filter; identical empty docs
    are dedup_exact's job (verify always skipped them anyway)."""
    sh, offs, n = _doc_shingles(batch)
    buckets = _band_buckets(_minhash_sigs(sh, offs, n))
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    present = np.diff(offs) > 0
    if not present.all():
        buckets, ids, n = buckets[present], ids[present], int(present.sum())
    return pa.table(
        {
            "band": pa.array(
                np.repeat(np.arange(NUM_BANDS, dtype=np.int32)[None, :], n, axis=0).ravel(),
                pa.int32(),
            ),
            "bucket": pa.array(buckets.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, NUM_BANDS), pa.int64()),
        }
    )


def simhash_batch(batch: pa.Table) -> pa.Table:
    """Vectorized 64-bit SimHash: per-word hash bit votes, reduceat per doc."""
    wh, parents, woffs = batch_words(batch.column("text"))
    n = batch.num_rows
    counts = np.diff(woffs)
    present = np.flatnonzero(counts > 0)
    acc = np.zeros((n, 64), dtype=np.int64)
    if len(present):
        seg = woffs[present]
        for b in range(64):
            bit = ((wh >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
            acc[present, b] = np.add.reduceat(bit, seg)
    bits = (acc > 0).astype(np.uint64)
    with np.errstate(over="ignore"):
        sim = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    cols = {
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(sim.view(np.int64), pa.int64()),
    }
    for c in range(4):  # 16-bit chunks for Hamming-banding
        cols[f"chunk{c}"] = pa.array(
            ((sim >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32),
            pa.int32(),
        )
    return pa.table(cols)


def simhash64(text: str) -> int:
    """Scalar mirror of simhash_batch for one document."""
    acc = np.zeros(64, dtype=np.int64)
    for w in words_scalar(text):
        h = word_hash_scalar(w)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(_docs_path(sf_dir), columns=list(columns))


def _ragged_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenation of [arange(s, s+l) for s, l in zip(starts, lengths)]
    without a Python loop (ones + boundary jumps + cumsum)."""
    tot = int(lengths.sum())
    if tot == 0:
        return np.zeros(0, dtype=np.int64)
    nz = lengths > 0
    s, ln = starts[nz].astype(np.int64), lengths[nz].astype(np.int64)
    out = np.ones(tot, dtype=np.int64)
    ends = np.cumsum(ln)
    out[0] = s[0]
    out[ends[:-1]] = s[1:] - (s[:-1] + ln[:-1] - 1)
    return np.cumsum(out)


def _pair_intersection_counts(
    a_vals: np.ndarray, a_offs: np.ndarray, ai: np.ndarray,
    b_vals: np.ndarray, b_offs: np.ndarray, bi: np.ndarray,
) -> np.ndarray:
    """inter[k] = |segment ai[k] of (a_vals, a_offs)  ∩  segment bi[k] of
    (b_vals, b_offs)| for every pair at once — sorted-merge via rank-packing
    (values -> ranks in their union, key = seg * R + rank, ONE searchsorted
    of all queries into the concatenated b side). Segments must be sorted
    and distinct within themselves, which is what _doc_shingles emits.
    Replaces the per-pair np.intersect1d loop (round-3 "What's wrong" #3)."""
    la = a_offs[ai + 1] - a_offs[ai]
    q_idx = _ragged_ranges(a_offs[ai], la)
    if len(q_idx) == 0 or len(b_vals) == 0:
        return np.zeros(len(ai), dtype=np.int64)
    q_val = a_vals[q_idx]
    q_pair = np.repeat(np.arange(len(ai), dtype=np.int64), la)
    uni = np.unique(np.concatenate([q_val, b_vals]))
    R = np.int64(len(uni) + 1)
    h_seg = np.repeat(
        np.arange(len(b_offs) - 1, dtype=np.int64), np.diff(b_offs)
    )
    h_key = h_seg * R + np.searchsorted(uni, b_vals)
    q_key = bi[q_pair].astype(np.int64) * R + np.searchsorted(uni, q_val)
    pos = np.searchsorted(h_key, q_key)
    found = h_key[np.minimum(pos, len(h_key) - 1)] == q_key
    return np.bincount(q_pair, weights=found, minlength=len(ai)).astype(np.int64)


# ---------------------------------------------------------------------------
# exact dedup (SQL-checked)
# ---------------------------------------------------------------------------

def exact_hash_batch(batch: pa.Table) -> pa.Table:
    """(h1, h2, doc_id) per row — the internal 128-bit content key.

    The key is two independent vectorized polynomial hashes over the raw
    UTF-8 bytes (texthash.batch_content_hash — numpy over the Arrow buffer,
    no per-row Python). It never appears in any query output, so it does not
    need an SQL mirror: the dedup_exact oracle groups by the text itself,
    and any collision-resistant key yields the same groups (~128 bits =>
    birthday bound ~2^64 documents)."""
    h1, h2 = batch_content_hash(batch.column("text"))
    return pa.table(
        {
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
            "doc_id": batch.column("doc_id"),
        }
    )


def q_exact_dedup(sf_dir: str):
    """Surviving doc per distinct text + duplicate count (hash-partitioned,
    per-group first by min doc_id). Only (h1, h2, doc_id) rows ever shuffle;
    the output is (keep_id, dup_count) so the internal hash stays internal
    and the DuckDB oracle can group by text directly."""
    import ray.data
    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir).map_batches(
        exact_hash_batch, batch_format="pyarrow", **remote_kwargs()
    )
    agg = ds.groupby(["h1", "h2"]).aggregate(Min("doc_id"), Count())
    df = agg.to_pandas()
    if len(df) == 0:  # empty corpus -> typed empty result
        return pa.table(
            {"keep_id": pa.array([], pa.int64()),
             "dup_count": pa.array([], pa.int64())}
        )
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    tbl = tbl.rename_columns(["h1", "h2", "keep_id", "dup_count"])
    return tbl.select(["keep_id", "dup_count"]).sort_by(
        [("keep_id", "ascending")]
    )


# coalesce(text, '') — the content hash maps NULL and '' to the same key
# (batch_content_hash's documented contract), so the mirror must too; the
# dedup-profiling mirrors already did this, and the parity fuzz caught that
# this one did not (NULL docs formed their own SQL group)
_EXACT_DEDUP_SQL = (
    "SELECT min(doc_id) AS keep_id, count(*) AS dup_count"
    " FROM documents GROUP BY coalesce(text, '') ORDER BY 1"
)


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard pairs (SQL-checked at small scale)
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.8
#: the exact all-pairs baseline broadcasts an inverted index of every doc's
#: word set — work is sum_w df(w)^2 posting probes plus an O(n) count array
#: per doc. Measured with the vectorized scorer (32 cpus, 120-word docs,
#: 5k vocab): 20k docs 6.1 s, 50k docs 13.8 s — so 100k is a comfortable
#: single-box envelope (minutes), while a heavy-stopword corpus grows as
#: df^2 and the MinHash-LSH path (bucketed verify) is the scale answer.
JACCARD_MAX_DOCS = 100_000


def q_jaccard_pairs(sf_dir: str):
    """Exact pairwise word-set Jaccard >= threshold — the O(n^2) oracle
    baseline gated by JACCARD_MAX_DOCS (dedup_minhash_near_dups is the
    scale path).

    Vectorized via an inverted index: the driver tokenizes once (Arrow
    split, exact strings — no hashing, so the SQL mirror is exact by
    construction), dictionary-encodes tokens, and broadcasts (per-doc sorted
    distinct token codes, postings CSR, set sizes) via ray.put. Each task
    scores a slice of query docs: per doc ONE ragged posting gather + ONE
    bincount yields intersection counts against every other doc at once —
    the only Python loop is over query docs, never over pairs or tokens."""
    import ray
    import ray.data

    from ..parquet_stats import file_num_rows

    # guard from footer metadata BEFORE any document leaves storage — the
    # whole point of the cap is to refuse the driver-side materialization
    n_docs = file_num_rows(_docs_path(sf_dir))
    if n_docs > JACCARD_MAX_DOCS:
        raise ValueError(
            f"dedup_jaccard_pairs is the O(n^2) exact baseline and is capped"
            f" at {JACCARD_MAX_DOCS} docs (got {n_docs}); use"
            " dedup_minhash_near_dups for large corpora"
        )
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "jac": pa.array([], pa.float64())}
    )
    if n_docs == 0:
        return empty
    import pyarrow.parquet as pq

    docs = pq.read_table(_docs_path(sf_dir), columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    text = docs.column("text").take(pa.array(order))
    # ASCII whitespace split — the explicit 6-byte class [\t\n\v\f\r ],
    # spelled out in BOTH engines (RE2 '\s' excludes \v, Python's includes it)
    toks = pc.split_pattern_regex(text, pattern=r"[ \t\n\r\x0b\x0c]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    # NULL text -> null list -> NaN length: zero it like _words_flat does,
    # or the int cast below crashes (parity fuzz regression)
    parents = np.repeat(
        np.arange(n_docs, dtype=np.int64),
        np.nan_to_num(
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64),
    )
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    flat, parents = flat.filter(pa.array(keep)), parents[keep]
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_vocab = len(enc.dictionary)
    if n_vocab == 0:
        return empty
    # distinct (doc, token): unique over packed keys, sorted by (doc, code)
    packed = np.unique(parents * n_vocab + codes)
    tok_par, tok_code = packed // n_vocab, packed % n_vocab
    tok_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(np.bincount(tok_par, minlength=n_docs), out=tok_offs[1:])
    sizes = np.diff(tok_offs)
    # postings CSR: docs per token code, sorted by (code, doc)
    porder = np.lexsort((tok_par, tok_code))
    post_docs = tok_par[porder]
    post_offs = np.zeros(n_vocab + 1, dtype=np.int64)
    np.cumsum(np.bincount(tok_code, minlength=n_vocab), out=post_offs[1:])
    data_ref = ray.put((ids, tok_code, tok_offs, post_docs, post_offs, sizes))

    def score(block: pa.Table) -> pa.Table:
        bids, tcode, toffs, pdocs, poffs, bsizes = ray.get(data_ref)
        n = len(bids)
        rows_a, rows_b, jacs = [], [], []
        for i in block.column("id").to_pylist():
            codes_i = tcode[toffs[i]:toffs[i + 1]]
            js = pdocs[
                _ragged_ranges(poffs[codes_i], poffs[codes_i + 1] - poffs[codes_i])
            ]
            cnt = np.bincount(js, minlength=n)
            inter = cnt[i + 1:]
            hit = np.flatnonzero(inter > 0)
            if len(hit) == 0:
                continue
            jac = inter[hit] / (bsizes[i] + bsizes[i + 1:][hit] - inter[hit])
            sel = jac >= JACCARD_THRESHOLD
            if not sel.any():
                continue
            j_idx = i + 1 + hit[sel]
            rows_a.append(np.full(int(sel.sum()), bids[i], dtype=np.int64))
            rows_b.append(bids[j_idx])
            jacs.append(np.round(jac[sel], 6))
        if not rows_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(rows_a), pa.int64()),
                "id_b": pa.array(np.concatenate(rows_b), pa.int64()),
                "jac": pa.array(np.concatenate(jacs), pa.float64()),
            }
        )

    # range(...) with many blocks so the O(n^2) pair space is scored across
    # tasks (from_arrow would yield ONE block = one serial task)
    idx = ray.data.range(
        len(ids), override_num_blocks=min(64, max(4, len(ids) // 32))
    )
    return idx.map_batches(score, batch_format="pyarrow", **remote_kwargs())


# word sets via the explicit ASCII-whitespace-class split with empties
# dropped — the exact semantics of the Ray side's split (plain
# string_split(' ') would keep empty tokens on double spaces and miss
# tabs/newlines; RE2's '\s' would miss \x0b, Python's would not)
_JACCARD_SQL = f"""
WITH s AS (
  SELECT doc_id, list_distinct(list_filter(
           string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'), x -> x != '')) AS ws
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

def _minhash_core_ctes() -> str:
    """Shared CTE prefix for every MinHash mirror (documents -> word hashes
    -> shingles -> 64-perm signatures -> per-band buckets), reproducing the
    numpy pipeline integer-for-integer via sqlhash.py: ASCII-ws tokenize ->
    byte-fold word hash -> word-3-gram shingle fold (short docs: one shingle
    over all words) -> distinct shingles -> 64 splitmix64(x ^ seed) minima
    -> per-band polynomial fold -> splitmix64 -> int64 bucket. Exposes CTEs
    ``shingles(doc_id, sh)`` and ``flat(doc_id, band, bucket)``; callers
    must open with WITH RECURSIVE (the byte-fold power table recurses). See
    sqlhash's module docstring for the exactness argument."""
    from .sqlhash import (
        M64,
        SM_C0,
        mulmod_sql,
        splitmix64_ctes,
        splitmix64_int,
        uint64_to_int64_sql,
        word_hash_ctes,
    )

    seeds = [splitmix64_int((i * SM_C0) % M64) for i in range(1, NUM_PERM + 1)]
    seed_lit = ", ".join(f"{s}::HUGEINT" for s in seeds)
    wb = int(WORD_BASE)

    wh_frag, wh_last = word_hash_ctes(int(BYTE_BASE))
    sh_sm, sh_last = splitmix64_ctes("sh", "sh_fold", ["doc_id"], "fold", "sh")
    ph_sm, ph_last = splitmix64_ctes("ph", "perm_x", ["doc_id", "p"], "x", "ph")
    bk_sm, bk_last = splitmix64_ctes("bk", "band_fold", ["doc_id", "band"], "fold", "bh")

    rows = NUM_PERM // NUM_BANDS
    fold8 = "s0"
    for r in range(1, rows):
        fold8 = f"(({fold8}) * {wb}::HUGEINT + s{r}) % {M64}::HUGEINT"
    pivot = ",\n    ".join(
        f"MAX(CASE WHEN p % {rows} = {r} THEN sig END) AS s{r}"
        for r in range(rows)
    )
    fold2 = f"({mulmod_sql('wh', wb)} + wh1) % {M64}::HUGEINT"
    fold3 = f"(({mulmod_sql(f'({fold2})', wb)}) + wh2) % {M64}::HUGEINT"

    return f"""{wh_frag},
win AS (
  SELECT doc_id, c, widx, wh,
         lead(wh, 1) OVER (PARTITION BY doc_id ORDER BY widx) AS wh1,
         lead(wh, 2) OVER (PARTITION BY doc_id ORDER BY widx) AS wh2
  FROM {wh_last}),
sh_fold AS (
  SELECT doc_id,
         CASE WHEN c >= {SHINGLE_K} THEN ({fold3})
              WHEN c = 2 THEN ({fold2})
              ELSE wh END AS fold
  FROM win
  WHERE (c >= {SHINGLE_K} AND widx <= c - {SHINGLE_K - 1})
     OR (c < {SHINGLE_K} AND widx = 1)),
{sh_sm},
shingles AS (SELECT DISTINCT doc_id, sh FROM {sh_last}),
perm_x AS (
  SELECT doc_id, p, xor(sh, seed) AS x
  FROM shingles,
       (SELECT unnest([{seed_lit}]) AS seed,
               unnest(range(0, {NUM_PERM})) AS p)),
{ph_sm},
sig AS (SELECT doc_id, p, MIN(ph) AS sig FROM {ph_last} GROUP BY doc_id, p),
band_fold AS (
  SELECT doc_id, band, fold FROM (
    SELECT doc_id, (p // {rows})::INTEGER AS band,
    {pivot}
    FROM sig GROUP BY doc_id, p // {rows}
  ) t, LATERAL (SELECT {fold8} AS fold)),
{bk_sm},
flat AS (
  SELECT doc_id, band, {uint64_to_int64_sql('bh')} AS bucket
  FROM {bk_last})"""


def _minhash_buckets_sql() -> str:
    """Exact DuckDB mirror of q_minhash_buckets (SQL-gated since round 5):
    the shared MinHash core + (band, bucket) group counts > 1."""
    return f"""
WITH RECURSIVE
{_minhash_core_ctes()}
SELECT band, bucket, count(*) AS n FROM flat
GROUP BY band, bucket HAVING count(*) > 1
ORDER BY band, bucket
"""


def _minhash_pairs_ctes() -> str:
    """Core + the verified near-dup pair CTE ``pairs(id_a, id_b, jac)``:
    bucket-sharing candidates (a.doc_id < b.doc_id over same (band,
    bucket)), verified by EXACT Jaccard over the distinct shingle-hash
    sets — the same two-stage contract as q_minhash_near_dups, so banding
    recall is identical by construction (both engines run the SAME bands)
    and the gate is exact, not probabilistic."""
    return f"""{_minhash_core_ctes()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM flat a JOIN flat b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
ssz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
pint AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.id_a
  JOIN shingles sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
  GROUP BY 1, 2),
pairs AS (
  SELECT p.id_a, p.id_b,
         round(p.i::DOUBLE / (za.sz + zb.sz - p.i), 6) AS jac
  FROM pint p
  JOIN ssz za ON za.doc_id = p.id_a
  JOIN ssz zb ON zb.doc_id = p.id_b
  WHERE p.i::DOUBLE / (za.sz + zb.sz - p.i) >= {JACCARD_THRESHOLD})"""


def _minhash_near_dups_sql() -> str:
    """Exact DuckDB mirror of q_minhash_near_dups (SQL-gated since r5)."""
    return ("WITH RECURSIVE\n" + _minhash_pairs_ctes()
            + "\nSELECT id_a, id_b, jac FROM pairs ORDER BY id_a, id_b")


def _minhash_cc_ctes() -> str:
    """Pair CTEs + connected components via recursive min-label
    reachability (the web_components mirror pattern); exposes ``r(n, l)``
    with l ranging over reachable labels (cluster id = min l per n). Shared
    by _minhash_keep_sql and corpus._clean_keep_ctes."""
    return _minhash_pairs_ctes() + """,
nodes AS (SELECT id_a AS n FROM pairs UNION SELECT id_b FROM pairs),
sym AS (SELECT id_a AS x, id_b AS y FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
r(n, l) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT s.x, r.l FROM sym s JOIN r ON s.y = r.n)"""


def _minhash_keep_sql() -> str:
    """Exact DuckDB mirror of q_minhash_dedup_keep (SQL-gated since r5):
    connected components over the verified pair edges, keep = cluster
    minimum."""
    return ("WITH RECURSIVE\n" + _minhash_cc_ctes() + """
SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS cluster,
       (n = min(l)) AS keep
FROM r GROUP BY 1 ORDER BY 1""")


def q_minhash_buckets(sf_dir: str):
    """(band, bucket) groups with >1 member = near-dup candidate groups."""
    ds = _docs(sf_dir).map_batches(
        minhash_bands_batch, batch_format="pyarrow", **remote_kwargs()
    )
    tbl = counts_table(ds, ["band", "bucket"])
    if tbl.num_rows == 0:  # zero blocks: rebuild the known types
        return pa.table(
            {"band": pa.array([], pa.int32()),
             "bucket": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    return tbl.filter(pc.greater(tbl.column("n"), 1))


#: cap on one bucket's candidate-pair EMISSION: the pair table a group
#: materializes is C(g,2) x 16 bytes in ONE output block (g=5000 -> ~200
#: MB), so the bound is memory, tighter than the time-bound VERIFY cap
CANDIDATE_MAX_BUCKET = 5_000


def _bucket_candidate_pairs(group: pa.Table, _cap: int | None = None) -> pa.Table:
    """One (band, bucket) group -> candidate pairs (id_a < id_b).

    Honest buckets are tiny candidate clusters; an adversarial
    (near-)identical corpus degenerates one bucket to O(n), which would make
    the candidate set quadratic — ENFORCED via min(CANDIDATE_MAX_BUCKET,
    VERIFY_MAX_GROUP) with a fail-fast pointer at dedup_exact (which
    handles identical docs in O(n)).
    """
    cap = min(CANDIDATE_MAX_BUCKET, VERIFY_MAX_GROUP) if _cap is None else _cap
    ids = np.unique(
        group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    g = len(ids)
    if g > cap:
        raise ValueError(
            f"near-dup candidate bucket has {g} members (cap {cap}): the"
            " corpus has a mass of (near-)identical documents collapsing"
            " into one LSH bucket, which makes pairwise verification"
            " quadratic. Run dedup_exact first to collapse identical texts,"
            " or raise dedup.VERIFY_MAX_GROUP deliberately."
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


#: id-range chunk width for the pair-verify stage: each task re-reads at
#: most two contiguous doc_id ranges of this many rows via filter pushdown
MINHASH_CHUNK_DOCS = 4096


def _read_docs_range(path: str, lo: int, hi: int) -> pa.Table:
    """Pushdown read of documents with doc_id in [lo, hi)."""
    import pyarrow.parquet as pq

    return pq.read_table(
        path,
        columns=["doc_id", "text"],
        filters=[("doc_id", ">=", lo), ("doc_id", "<", hi)],
    )


def _minhash_chunk_verify_fn(path: str, lo: int, chunk: int):
    """Verify one (chunk_a, chunk_b) group of candidate pairs: pushdown-read
    the two CONTIGUOUS doc_id ranges, recompute distinct shingle sets with
    the same vectorized kernel the banding used, and keep pairs whose exact
    Jaccard clears the threshold. Per-task memory is 2 x MINHASH_CHUNK_DOCS
    documents at any corpus size; each occupied chunk pair is read once.
    All the group's intersections are computed in ONE rank-packed
    sorted-merge (_pair_intersection_counts) — no per-pair Python."""

    def _sets(tbl: pa.Table):
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        tbl = tbl.take(pa.array(order))
        ids = ids[order]
        sh, offs, _n = _doc_shingles(tbl)
        return ids, sh, offs

    def _verify(group: pa.Table) -> pa.Table:
        a = group.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = group.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = int((a[0] - lo) // chunk)
        cb = int((b[0] - lo) // chunk)
        ta = _read_docs_range(path, lo + ca * chunk, lo + (ca + 1) * chunk)
        aids, ash, aoffs = _sets(ta)
        if cb == ca:
            bids, bsh, boffs = aids, ash, aoffs
        else:
            bids, bsh, boffs = _sets(
                _read_docs_range(path, lo + cb * chunk, lo + (cb + 1) * chunk)
            )
        ia = np.searchsorted(aids, a)
        ib = np.searchsorted(bids, b)
        la = aoffs[ia + 1] - aoffs[ia]
        lb = boffs[ib + 1] - boffs[ib]
        inter = _pair_intersection_counts(ash, aoffs, ia, bsh, boffs, ib)
        ok = (la > 0) & (lb > 0) & (inter > 0)
        jac = np.zeros(len(a))
        jac[ok] = inter[ok] / (la[ok] + lb[ok] - inter[ok])
        keep = jac >= JACCARD_THRESHOLD
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "jac": pa.array(np.round(jac[keep], 6), pa.float64()),
            }
        )

    return _verify


def q_minhash_near_dups(sf_dir: str):
    """Candidate pairs from LSH buckets, verified by exact Jaccard.

    Scale shape (round-3 rework): the band fan-out carries (band, bucket,
    doc_id) ONLY — 20-byte rows through the heavy exchange, where the
    round-2 version shipped each doc's full distinct-shingle set with every
    one of its NUM_BANDS=8 band rows (x8 the shingle bytes). Candidate
    pairs are emitted per bucket (capped), deduped by a tiny groupby, keyed
    by their (id_a chunk, id_b chunk) cell, and each chunk-pair group
    pushdown-reads its two contiguous doc_id ranges ONCE and recomputes
    shingles with the same vectorized kernel — so every pair is verified
    exactly once and no shingle bytes ever shuffle. No driver-side
    materialization of the documents dataset at any point."""
    from ..parquet_stats import column_stats_bounds, file_num_rows

    path = _docs_path(sf_dir)
    if file_num_rows(path) == 0:  # footer-only check; no stats to read
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jac": pa.array([], pa.float64())}
        )
    ds = _docs(sf_dir).map_batches(
        minhash_bands_batch, batch_format="pyarrow", **remote_kwargs()
    )
    # captured driver-side so overrides reach workers
    cap = min(CANDIDATE_MAX_BUCKET, VERIFY_MAX_GROUP)
    cand = ds.groupby(["band", "bucket"]).map_groups(
        lambda g: _bucket_candidate_pairs(g, cap),
        batch_format="pyarrow", **remote_kwargs()
    )
    uniq = cand.groupby(["id_a", "id_b"]).count()
    lo_f, _hi_f = column_stats_bounds(path, "doc_id")
    lo, chunk = int(lo_f), MINHASH_CHUNK_DOCS

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
        _minhash_chunk_verify_fn(path, lo, chunk),
        batch_format="pyarrow", **remote_kwargs()
    )
    df = pairs.to_pandas()
    if len(df) == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jac": pa.array([], pa.float64()),
            }
        )
    df = df.sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(
        df.reset_index(drop=True)[["id_a", "id_b", "jac"]], preserve_index=False
    )


def q_simhash(sf_dir: str):
    return _docs(sf_dir).map_batches(
        simhash_batch, batch_format="pyarrow", **remote_kwargs()
    )


def minhash_exchange_stats(sf_dir: str) -> dict:
    """Measure the MinHash band exchange, don't estimate it: materialize the
    id-only fan-out (the exact dataset `q_minhash_near_dups` feeds its heavy
    groupby) and report its Arrow bytes, alongside what the round-2 shape —
    every doc's distinct shingle set replicated onto each of its NUM_BANDS
    band rows — would have shipped (distinct shingles x 8 B x NUM_BANDS,
    summed by a per-batch partial; no shuffle). Used by bench.py so the
    multi-node byte trade is a recorded artifact every round, not a one-off
    hand measurement (round-3 process ask)."""
    fan = _docs(sf_dir).map_batches(
        minhash_bands_batch, batch_format="pyarrow", **remote_kwargs()
    ).materialize()
    id_only_bytes = int(fan.size_bytes())
    n_rows = int(fan.count())

    def shingle_bytes(batch: pa.Table) -> pa.Table:
        sh, offs, _n = _doc_shingles(batch)
        return pa.table({"b": pa.array([len(sh) * 8 * NUM_BANDS], pa.int64())})

    r2 = int(
        _docs(sf_dir)
        .map_batches(shingle_bytes, batch_format="pyarrow", **remote_kwargs())
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
# SimHash near-dup pairs: 16-bit chunk banding guarantees that any pair with
# Hamming distance <= 3 shares at least one of the four chunks (pigeonhole),
# so candidates come from groupby(chunk_idx, chunk_val) and are verified by
# an in-group vectorized XOR popcount — the same bucketed-verify shape as
# the MinHash path, signatures travel with the group.
# ---------------------------------------------------------------------------

SIMHASH_HAMMING_MAX = 3


def simhash_chunk_fanout(batch: pa.Table) -> pa.Table:
    sigs = simhash_batch(batch)
    # word-less documents all hash to 0: excluding them mirrors the MinHash
    # path's empty-shingle skip and prevents a quadratic pair blowup from
    # one giant all-zero bucket (identical docs are dedup_exact's job)
    wh, _parents, woffs = batch_words(batch.column("text"))
    has_words = np.diff(woffs) > 0
    if not has_words.all():
        sigs = sigs.filter(pa.array(has_words))
    parts = []
    for c in range(4):
        parts.append(
            pa.table(
                {
                    "chunk_idx": pa.array(
                        np.full(sigs.num_rows, c, dtype=np.int8), pa.int8()
                    ),
                    "chunk_val": sigs.column(f"chunk{c}"),
                    "doc_id": sigs.column("doc_id"),
                    "simhash": sigs.column("simhash"),
                }
            )
        )
    return pa.concat_tables(parts)


#: 16-bit popcount lookup (64 KB, built once) — numpy 1.26 has no
#: bitwise_count, and unpackbits over a g x g x 8 byte view costs g^2 x 64
#: bytes (25 GB at g=20k); four LUT probes cost g^2 x 4 reads instead
_POP16 = np.zeros(1 << 16, dtype=np.uint8)
for _s in range(16):
    _POP16 += ((np.arange(1 << 16) >> _s) & 1).astype(np.uint8)

#: row-block width for the pairwise XOR-popcount (bounds peak temp memory
#: at SIMHASH_VERIFY_BLOCK x group x ~12 bytes)
SIMHASH_VERIFY_BLOCK = 512


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via four 16-bit LUT probes."""
    M = np.uint64(0xFFFF)
    return (
        _POP16[(x & M).astype(np.int64)]
        + _POP16[((x >> np.uint64(16)) & M).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & M).astype(np.int64)]
        + _POP16[(x >> np.uint64(48)).astype(np.int64)]
    )


def _simhash_verify_group(group: pa.Table, _cap: int | None = None) -> pa.Table:
    """Pairwise Hamming verify, ROW-BLOCKED so peak memory is
    SIMHASH_VERIFY_BLOCK x g temporaries rather than a dense g x g x 64
    bit-expansion — the cap then bounds quadratic TIME, not an OOM."""
    cap = VERIFY_MAX_GROUP if _cap is None else _cap
    ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) > cap:
        raise ValueError(
            f"simhash verify group has {len(ids)} members (cap"
            f" {cap}): a mass of (near-)identical documents"
            " collapsed into one chunk bucket. Run dedup_exact first, or"
            " raise dedup.VERIFY_MAX_GROUP deliberately."
        )
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int64())}
    )
    if len(ids) < 2:
        return empty
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sigs = (
        group.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64)
    )[order].view(np.uint64)
    out_a, out_b, out_h = [], [], []
    for i0 in range(0, len(ids), SIMHASH_VERIFY_BLOCK):
        blk = sigs[i0:i0 + SIMHASH_VERIFY_BLOCK]
        ham = _popcount64(blk[:, None] ^ sigs[None, :])
        ai, bj = np.nonzero(
            (ham <= SIMHASH_HAMMING_MAX)
            & (ids[i0:i0 + SIMHASH_VERIFY_BLOCK, None] < ids[None, :])
        )
        if len(ai):
            out_a.append(ids[i0 + ai])
            out_b.append(ids[bj])
            out_h.append(ham[ai, bj].astype(np.int64))
    if not out_a:
        return empty
    return pa.table(
        {
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), pa.int64()),
        }
    )


def q_simhash_near_dups(sf_dir: str):
    """SimHash near-dup pairs (Hamming <= SIMHASH_HAMMING_MAX), candidates
    from chunk-equality buckets, verified per bucket on the workers; a tiny
    groupby collapses pairs found via multiple chunks. Rows-only."""
    ds = _docs(sf_dir).map_batches(
        simhash_chunk_fanout, batch_format="pyarrow", **remote_kwargs()
    )
    cap = VERIFY_MAX_GROUP  # captured driver-side so overrides reach workers
    pairs = ds.groupby(["chunk_idx", "chunk_val"]).map_groups(
        lambda g: _simhash_verify_group(g, cap),
        batch_format="pyarrow", **remote_kwargs()
    )
    df = pairs.groupby(["id_a", "id_b"]).min("hamming").to_pandas()
    if len(df) == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
    df = df.rename(columns={"min(hamming)": "hamming"}).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(
        df.reset_index(drop=True)[["id_a", "id_b", "hamming"]], preserve_index=False
    )


def _simhash_core_ctes() -> str:
    """Shared DuckDB CTE core for the SimHash mirrors (SQL-gated since
    round 5): word-OCCURRENCE hashes (sqlhash.word_hash_ctes — same
    splitmix64-of-byte-fold as batch_words) -> signed votes per bit
    (repeated words vote with multiplicity, matching simhash_batch's
    per-occurrence reduceat) -> ``sims(doc_id, sim)`` with sim the uint64
    SimHash carried as HUGEINT in [0, 2^64). Word-less (empty / NULL-text)
    documents produce no sims row — callers LEFT JOIN + coalesce to 0,
    matching simhash_batch's all-zero accumulator. Callers must open with
    WITH RECURSIVE (the byte-fold power table recurses). Exactness: every
    step is integer arithmetic; a tie vote (v = 0) sets the bit to 0 in
    both engines (numpy ``acc > 0`` / SQL ``v > 0``)."""
    from .sqlhash import word_hash_ctes

    wh_frag, wh_last = word_hash_ctes(int(BYTE_BASE))
    return f"""{wh_frag},
wcnt AS (SELECT doc_id, wh, count(*)::HUGEINT AS m FROM {wh_last} GROUP BY 1, 2),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN ((wh >> b) & 1::HUGEINT) = 1::HUGEINT THEN m ELSE -m END) AS v
  FROM wcnt, (SELECT unnest(range(0, 64)) AS b)
  GROUP BY 1, 2),
sims AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS sim
  FROM votes GROUP BY 1)"""


def _simhash_sql() -> str:
    """Exact DuckDB mirror of q_simhash: per-doc signature + the four
    16-bit Hamming-banding chunks."""
    from .sqlhash import uint64_to_int64_sql

    s = "coalesce(s.sim, 0::HUGEINT)"
    chunks = ",\n       ".join(
        f"(({s} >> {16 * c}) & 65535::HUGEINT)::INTEGER AS chunk{c}"
        for c in range(4)
    )
    return f"""
WITH RECURSIVE
{_simhash_core_ctes()}
SELECT d.doc_id,
       {uint64_to_int64_sql(s)} AS simhash,
       {chunks}
FROM documents d LEFT JOIN sims s USING (doc_id)
ORDER BY d.doc_id
"""


def _simhash_near_dups_sql() -> str:
    """Exact DuckDB mirror of q_simhash_near_dups. The mirror skips the
    chunk-banding and applies the Hamming predicate directly: at
    SIMHASH_HAMMING_MAX = 3 < 4 chunks, pigeonhole guarantees every
    qualifying pair shares at least one aligned 16-bit chunk, so the Ray
    side's bucket-candidate recall is EXACTLY 1.0 and the two result sets
    coincide by construction (the banding is a pure pruning device, not an
    approximation). bit_count over the int64 two's-complement views equals
    the uint64 XOR popcount (verified: bit_count(-1::BIGINT) = 64)."""
    from .sqlhash import uint64_to_int64_sql

    assert SIMHASH_HAMMING_MAX < 4, "pigeonhole exactness needs max < chunks"
    return f"""
WITH RECURSIVE
{_simhash_core_ctes()},
si AS (SELECT doc_id, {uint64_to_int64_sql('sim')} AS s FROM sims)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM si a JOIN si b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {SIMHASH_HAMMING_MAX}
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# near-dup clusters / keep-set: connected components over the verified pair
# list. Two implementations, picked by where the edges live:
#
# * union_find_components — the pair list in q_minhash_dedup_keep is, by
#   contract, a DRIVER table (it is the near-dup query's own result), so
#   union-find over it is O(pairs α(n)) in one process with no shuffles at
#   all. This is the default path.
# * connected_components — distributed hash-to-min (Rastogi et al. 2013)
#   over an edge DATASET for the scale regime where pairs no longer fit a
#   driver table. Each round: two-phase per-node minima (per-batch partial
#   minima -> one small groupby — the salted-aggregate shape, never a
#   full-edge sort), then a minima lookup to re-emit (m <-> y)/(m <-> x)
#   edges with per-batch dedup (np.unique, no global groupby per round —
#   Ray's sort aggregate on the full multiset was measured at minutes per
#   round on 2M edges). The LOOKUP has two strategies (mode="auto" picks by
#   node count): "broadcast" ships the minima vector once per worker via
#   ray.put — O(nodes) driver/broadcast memory, capped at
#   CC_MAX_BROADCAST_NODES — while "sharded" tags minima rows into the edge
#   stream and sorts on x so each block resolves m(x) locally: no broadcast,
#   no driver materialization, any node count, one extra sort per round.
#   Convergence: when the minima stop changing (exact vector compare for
#   broadcast; count+wrap-sum checksum probe for sharded), the labeling is
#   POST-VALIDATED by a distributed pass asserting label(x) == label(y) on
#   every CURRENT edge (a sound check: labels are node ids propagated along
#   edges, the component minimum labels itself, and edge-constancy forces
#   every node to that minimum), retrying until CC_MAX_ROUNDS before
#   raising.
# ---------------------------------------------------------------------------

CC_MAX_ROUNDS = 12

#: hard cap on a single in-bucket exact verify (MinHash and SimHash paths):
#: a group of g members is O(g^2) pairwise work, so a degenerate corpus must
#: fail fast with a pointer at dedup_exact rather than stall a worker
VERIFY_MAX_GROUP = 20_000

#: connected_components broadcasts the per-round minima vector (two int64
#: arrays, one entry per node IN A PAIR) via ray.put and folds it on the
#: driver — O(nodes-in-pairs), the same order as the op's own output. 16
#: bytes/node => ~1.6 GB at 10^8 nodes; beyond that the broadcast (not the
#: algorithm) is the bottleneck and the minima must be hash-sharded. The
#: bound is asserted so the failure is a clear error, not an OOM.
CC_MAX_BROADCAST_NODES = 100_000_000


def union_find_components(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side union-find: (nodes_sorted, component_min_per_node)."""
    nodes = np.unique(np.concatenate([a, b]))
    idx_a = np.searchsorted(nodes, a)
    idx_b = np.searchsorted(nodes, b)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, parent[i]
        return root

    for i, j in zip(idx_a.tolist(), idx_b.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)  # union by smaller node id
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    return nodes, nodes[roots]


def _cc_partial_minima_batch(t: pa.Table) -> pa.Table:
    """Per-batch combiner: one (x, partial min over neighbors ∪ self) row
    per node present in the batch — only these partials hit the groupby."""
    x = t.column("x").to_numpy(zero_copy_only=False)
    y = t.column("y").to_numpy(zero_copy_only=False)
    order = np.argsort(x, kind="stable")
    xs, ys = x[order], y[order]
    uniq, first = np.unique(xs, return_index=True)
    m = np.minimum(np.minimum.reduceat(ys, first), uniq)
    return pa.table({"x": pa.array(uniq, pa.int64()), "y": pa.array(m, pa.int64())})


def _cc_minima(edges):
    """(x, m) Dataset: m = min(neighbors ∪ self) per node — two-phase."""

    def fold(t: pa.Table) -> pa.Table:
        return pa.table({"x": t.column("x"), "m": t.column("min(y)")})

    partials = edges.map_batches(
        _cc_partial_minima_batch, batch_format="pyarrow", **remote_kwargs()
    )
    return partials.groupby("x").min("y").map_batches(
        fold, batch_format="pyarrow", **remote_kwargs()
    )


def _cc_emit_fn(minima_ref):
    """Edges (x, y) -> next-round edges (m(x) <-> y) and (m(x) <-> x), m
    looked up in the broadcast sorted minima arrays; per-batch deduped."""
    import ray

    def _emit(t: pa.Table) -> pa.Table:
        xs_sorted, ms_sorted = ray.get(minima_ref)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        m = ms_sorted[np.searchsorted(xs_sorted, x)]
        src = np.concatenate([y, x])
        dst = np.concatenate([m, m])
        keep = src != dst
        pairs = np.stack([src[keep], dst[keep]], axis=1)
        if len(pairs):
            pairs = np.unique(pairs, axis=0)  # local dedup, no shuffle
        return pa.table(
            {
                "x": pa.array(np.concatenate([pairs[:, 0], pairs[:, 1]]), pa.int64()),
                "y": pa.array(np.concatenate([pairs[:, 1], pairs[:, 0]]), pa.int64()),
            }
        )

    return _emit


def _cc_labels_consistent(edges, minima_ref) -> bool:
    """Distributed post-check: label(x) == label(y) for every current edge."""
    import ray
    from ray.data.aggregate import Sum

    def check(t: pa.Table) -> pa.Table:
        xs_sorted, ms_sorted = ray.get(minima_ref)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        lx = ms_sorted[np.searchsorted(xs_sorted, x)]
        ly = ms_sorted[np.searchsorted(xs_sorted, y)]
        return pa.table({"bad": pa.array([int((lx != ly).sum())], pa.int64())})

    agg = edges.map_batches(
        check, batch_format="pyarrow", **remote_kwargs()
    ).aggregate(Sum("bad"))
    return int(agg["sum(bad)"]) == 0


def _cc_symmetrize_batch(t: pa.Table) -> pa.Table:
    """Emit both directions of every edge, deduped per batch — hash-to-min
    requires a symmetric edge list (a y-only node would be absent from the
    minima vector and searchsorted would return a NEIGHBOR's minimum)."""
    x = t.column("x").to_numpy(zero_copy_only=False)
    y = t.column("y").to_numpy(zero_copy_only=False)
    pairs = np.stack(
        [np.concatenate([x, y]), np.concatenate([y, x])], axis=1
    )
    if len(pairs):
        pairs = np.unique(pairs, axis=0)
    return pa.table(
        {"x": pa.array(pairs[:, 0], pa.int64()),
         "y": pa.array(pairs[:, 1], pa.int64())}
    )


def connected_components(edges, mode: str = "auto"):
    """(x, y) edge Dataset -> (node, component) Dataset where component is
    the minimum node id reachable from `node` (distributed hash-to-min; see
    the section comment for the convergence/validation contract).

    Edges are symmetrized on entry (one pass emitting both directions,
    per-batch deduped), so callers may pass a directed pair list such as a
    near-dup (id_a < id_b) result directly.

    Two per-round minima-lookup strategies, pinned equivalent in tests:

    * ``broadcast`` — the minima vector ships once per worker via ray.put
      and the driver folds it: O(nodes-in-pairs) driver/broadcast memory
      (16 bytes/node; ~1.6 GB at 10^8), one exchange per round. Fastest
      when the vector fits; REFUSES past CC_MAX_BROADCAST_NODES.
    * ``sharded`` — no broadcast and no driver materialization at ANY node
      count: minima rows are co-partitioned with their edges by tagging
      them into the edge stream and sorting on x (equal keys land in one
      block — the property the kNN fold pins), so each block resolves m(x)
      with a local searchsorted. Convergence is probed by an
      order-independent (count, wrap-sum checksum) pair folded from
      per-block partials, then VALIDATED by the distributed
      label(x) == label(y) edge check before returning (the probe alone
      can collide; the validation is sound — see _cc_labels_ok_sharded).
      Costs one extra sort per round; that is the price of unbounded n.

    ``auto`` counts the first minima pass and picks broadcast iff the
    vector fits the bound."""
    import ray.data

    edges = edges.map_batches(
        _cc_symmetrize_batch, batch_format="pyarrow", **remote_kwargs()
    )
    first = None
    if mode == "auto":
        # the probe pass doubles as round 1's minima — not recomputed
        first = _cc_minima(edges).materialize()
        mode = (
            "broadcast" if first.count() <= CC_MAX_BROADCAST_NODES
            else "sharded"
        )
    if mode == "broadcast":
        return _cc_broadcast_loop(edges, first)
    if mode == "sharded":
        return _cc_sharded_loop(edges, first)
    raise ValueError(f"unknown connected_components mode {mode!r}")


def _cc_broadcast_loop(edges, first=None):
    import ray as _ray
    import ray.data

    prev = None
    for _round in range(CC_MAX_ROUNDS):
        src = first if (_round == 0 and first is not None) else _cc_minima(edges)
        mdf = src.to_pandas()  # O(nodes in pair graph)
        if len(mdf) > CC_MAX_BROADCAST_NODES:
            raise ValueError(
                f"connected_components: {len(mdf)} nodes exceed the"
                f" broadcast-minima bound ({CC_MAX_BROADCAST_NODES});"
                " use mode='sharded' (no broadcast, no driver"
                " materialization) or raise dedup.CC_MAX_BROADCAST_NODES"
                " on a driver with the memory to hold it."
            )
        xs = mdf["x"].to_numpy()
        order = np.argsort(xs)
        xs, ms = xs[order], mdf["m"].to_numpy()[order]
        minima_ref = _ray.put((xs, ms))
        if (
            prev is not None
            and len(prev[0]) == len(xs)
            and np.array_equal(prev[0], xs)
            and np.array_equal(prev[1], ms)
            and _cc_labels_consistent(edges, minima_ref)
        ):
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(xs, pa.int64()),
                        "component": pa.array(ms, pa.int64()),
                    }
                )
            )
        prev = (xs, ms)
        edges = edges.map_batches(
            _cc_emit_fn(minima_ref), batch_format="pyarrow", **remote_kwargs()
        ).materialize()  # each round builds on the last
    raise RuntimeError(
        f"connected_components did not converge within {CC_MAX_ROUNDS}"
        " rounds — raise CC_MAX_ROUNDS (hash-to-min needs O(log diameter)"
        " rounds; 12 covers any realistic near-dup graph)"
    )


# --- sharded (broadcast-free) strategy -------------------------------------

def _cc_tag(tag: int):
    """Stamp a constant int8 tag column onto (x, y) rows."""

    def _t(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": pc.cast(t.column(t.schema.names[0]), pa.int64()),
                "y": pc.cast(t.column(t.schema.names[1]), pa.int64()),
                "tag": pa.array(
                    np.full(t.num_rows, tag, dtype=np.int8), pa.int8()
                ),
            }
        )

    return _t


def _cc_block_minima_lookup(t: pa.Table):
    """Split one sorted block into (edge rows, block-local minima arrays)
    and resolve m(x) for every edge row. Soundness: the block comes from
    sort("x") over edges ∪ tagged-minima, so every edge x's single minima
    row is co-located; a missing key means the precondition broke -> raise."""
    x = t.column("x").to_numpy(zero_copy_only=False)
    y = t.column("y").to_numpy(zero_copy_only=False)
    tag = t.column("tag").to_numpy(zero_copy_only=False)
    is_min = tag == 1
    mx, mm = x[is_min], y[is_min]
    order = np.argsort(mx, kind="stable")
    mx, mm = mx[order], mm[order]
    ex, ey = x[~is_min], y[~is_min]
    if len(ex) == 0:
        return ex, ey, ex  # no edges in this block
    pos = np.searchsorted(mx, ex)
    if len(mx) == 0 or pos.max(initial=0) >= len(mx) or not (
        mx[np.minimum(pos, len(mx) - 1)] == ex
    ).all():
        raise RuntimeError(
            "connected_components(sharded): an edge endpoint has no"
            " co-located minima row — the sort co-location precondition"
            " broke (please report; falling back to mode='broadcast'"
            " is safe)"
        )
    return ex, ey, mm[pos]


def _cc_emit_block_sharded(t: pa.Table) -> pa.Table:
    """The sharded analog of _cc_emit_fn: (x, y) -> (m(x) <-> y) and
    (m(x) <-> x), per-batch deduped, with m looked up block-locally."""
    ex, ey, m = _cc_block_minima_lookup(t)
    src = np.concatenate([ey, ex])
    dst = np.concatenate([m, m])
    keep = src != dst
    pairs = np.stack([src[keep], dst[keep]], axis=1)
    if len(pairs):
        pairs = np.unique(pairs, axis=0)
    return pa.table(
        {
            "x": pa.array(np.concatenate([pairs[:, 0], pairs[:, 1]]), pa.int64()),
            "y": pa.array(np.concatenate([pairs[:, 1], pairs[:, 0]]), pa.int64()),
        }
    )


def _cc_with_minima_sorted(edges, minima):
    """edges ∪ tagged minima, sorted on x: equal keys co-locate per block."""
    te = edges.map_batches(_cc_tag(0), batch_format="pyarrow", **remote_kwargs())
    tm = minima.map_batches(_cc_tag(1), batch_format="pyarrow", **remote_kwargs())
    return te.union(tm).sort("x")


def _cc_minima_probe(minima) -> tuple[int, int]:
    """(count, order-independent wrap-sum checksum of splitmix64(x) ^ m) —
    per-block partials folded on the driver (O(blocks) rows)."""

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.uint64)
        m = t.column("m").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            chk = (_splitmix64(x) ^ _splitmix64(m)).sum(dtype=np.uint64)
        return pa.table(
            {"n": pa.array([len(x)], pa.int64()),
             "chk": pa.array([int(chk.view(np.int64))], pa.int64())}
        )

    df = minima.map_batches(
        partial, batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    if len(df) == 0:
        return 0, 0
    with np.errstate(over="ignore"):
        chk = df["chk"].to_numpy().view(np.uint64).sum(dtype=np.uint64)
    return int(df["n"].sum()), int(chk)


def _cc_labels_ok_sharded(edges, minima) -> bool:
    """Distributed label(x) == label(y) over every edge, broadcast-free:
    pass 1 resolves label(x) per edge (sort-on-x co-location) and re-keys
    the row by y; pass 2 co-locates those rows with minima-on-y and counts
    mismatches. Sound for the same reason as the broadcast check."""
    from ray.data.aggregate import Sum

    def rekey(t: pa.Table) -> pa.Table:
        ex, ey, lx = _cc_block_minima_lookup(t)
        return pa.table(
            {"x": pa.array(ey, pa.int64()), "y": pa.array(lx, pa.int64())}
        )

    by_y = _cc_with_minima_sorted(edges, minima).map_batches(
        rekey, batch_format="pyarrow", batch_size=None, **remote_kwargs()
    )

    def mismatch(t: pa.Table) -> pa.Table:
        ex, lx, ly = _cc_block_minima_lookup(t)
        return pa.table({"bad": pa.array([int((lx != ly).sum())], pa.int64())})

    agg = _cc_with_minima_sorted(by_y, minima).map_batches(
        mismatch, batch_format="pyarrow", batch_size=None, **remote_kwargs()
    ).aggregate(Sum("bad"))
    return int(agg["sum(bad)"]) == 0


def _cc_sharded_loop(edges, first=None):
    prev_probe = None
    for _round in range(CC_MAX_ROUNDS):
        minima = (
            first if (_round == 0 and first is not None)
            else _cc_minima(edges).materialize()
        )
        probe = _cc_minima_probe(minima)
        if prev_probe == probe and _cc_labels_ok_sharded(edges, minima):
            def rename(t: pa.Table) -> pa.Table:
                return pa.table(
                    {"node": t.column("x"), "component": t.column("m")}
                )

            return minima.map_batches(
                rename, batch_format="pyarrow", **remote_kwargs()
            )
        prev_probe = probe
        edges = _cc_with_minima_sorted(edges, minima).map_batches(
            _cc_emit_block_sharded, batch_format="pyarrow", batch_size=None,
            **remote_kwargs()
        ).materialize()
    raise RuntimeError(
        f"connected_components did not converge within {CC_MAX_ROUNDS}"
        " rounds — raise CC_MAX_ROUNDS (hash-to-min needs O(log diameter)"
        " rounds; 12 covers any realistic near-dup graph)"
    )


def q_minhash_dedup_keep(sf_dir: str):
    """Near-dup KEEP-SET: cluster the verified MinHash pairs and keep the
    minimum doc_id per cluster. Returns (doc_id, cluster, keep) for every
    doc that appears in a near-dup pair; docs in no pair are implicitly
    kept. The pair list is this op's own driver-resident result, so
    clustering is driver union-find (O(pairs), measured <2 s on 1M pairs);
    ``connected_components`` is the distributed path for dataset-scale edge
    lists and is pinned equivalent to union-find in tests. Rows-only."""
    pairs = q_minhash_near_dups(sf_dir)
    if pairs.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "keep": pa.array([], pa.bool_()),
            }
        )
    a = pairs.column("id_a").to_numpy(zero_copy_only=False)
    b = pairs.column("id_b").to_numpy(zero_copy_only=False)
    nodes, comp = union_find_components(a, b)
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster": pa.array(comp, pa.int64()),
            "keep": pa.array(nodes == comp, pa.bool_()),
        }
    )


register("dedup_exact", q_exact_dedup, _EXACT_DEDUP_SQL)
register("dedup_jaccard_pairs", q_jaccard_pairs, _JACCARD_SQL)
# SQL-gated since round 5: the full hash pipeline is mirrored
# integer-exactly in DuckDB (see _minhash_buckets_sql / sqlhash.py).
register("dedup_minhash_buckets", q_minhash_buckets, _minhash_buckets_sql())
# SQL-gated since round 5: bucket-sharing candidates + exact-Jaccard
# verify, both engines running the SAME bands (see _minhash_near_dups_sql).
register("dedup_minhash_near_dups", q_minhash_near_dups, _minhash_near_dups_sql())
# SQL-gated since round 5: recursive min-label CC over the mirrored pair
# edges (see _minhash_keep_sql).
register("dedup_minhash_keep", q_minhash_dedup_keep, _minhash_keep_sql())
# SQL-gated since round 5: per-occurrence bit votes mirrored
# integer-exactly; near-dups via the direct Hamming predicate (pigeonhole
# makes the chunk banding lossless at max 3 — see _simhash_near_dups_sql).
register("dedup_simhash", q_simhash, _simhash_sql())
register("dedup_simhash_near_dups", q_simhash_near_dups, _simhash_near_dups_sql())


# ---------------------------------------------------------------------------
# dedup profiling — the corpus-health reports a cleaning run is judged by.
# Both compose the exact-dedup machinery: only (hash, partial-count) rows
# ever shuffle; the outputs are timeline-independent tiny tables. As with
# dedup_exact, the DuckDB mirrors group by the TEXT itself while the Ray
# side groups by the collision-resistant 128-bit content key — identical
# groups at any realistic corpus size (see exact_hash_batch docstring).
# NULL-handling contract: batch_content_hash hashes NULL text identically
# to '', so the mirrors group by coalesce(text, '') — NULL-text docs merge
# with empty docs on BOTH engines; NULL source is its own group (pandas
# dropna=False, SQL GROUP BY keeps NULLs).

def _groupsize_partials(t: pa.Table) -> pa.Table:
    """(group_size, n_groups) partial per block of per-text counts."""
    if t.num_rows == 0 or "count()" not in t.column_names:
        return pa.table(
            {"group_size": pa.array([], pa.int64()),
             "n_groups": pa.array([], pa.int64())}
        )
    sizes = (
        t.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    uniq, counts = np.unique(sizes, return_counts=True)
    return pa.table(
        {
            "group_size": pa.array(uniq, pa.int64()),
            "n_groups": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def q_dedup_group_stats(sf_dir: str):
    """(group_size, n_groups, n_docs) — the histogram of exact-duplicate
    cluster sizes. Two-phase: per-text counts (hash groupby), then a
    count-of-counts combiner per block folded by one tiny groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    counts = (
        _docs(sf_dir)
        .map_batches(exact_hash_batch, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["h1", "h2"]).count()
    )
    df = (
        counts.map_batches(_groupsize_partials, batch_format="pyarrow",
                           **remote_kwargs())
        .groupby("group_size").aggregate(Sum("n_groups"))
        .to_pandas()  # O(distinct group sizes)
    )
    if len(df) == 0:
        return pa.table(
            {"group_size": pa.array([], pa.int64()),
             "n_groups": pa.array([], pa.int64()),
             "n_docs": pa.array([], pa.int64())}
        )
    df = df.rename(columns={"sum(n_groups)": "n_groups"})
    df["n_docs"] = df["group_size"] * df["n_groups"]
    df = df.sort_values("group_size").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["group_size", "n_groups", "n_docs"]], preserve_index=False
    )


_GROUP_STATS_SQL = """
WITH g AS (SELECT count(*) AS group_size FROM documents
           GROUP BY coalesce(text, ''))
SELECT group_size, count(*) AS n_groups, group_size * count(*) AS n_docs
FROM g GROUP BY 1 ORDER BY 1
"""


_NULL_SOURCE = "\x00"  # shuffle-safe stand-in for a NULL source group key


def q_dup_rate_by_source(sf_dir: str):
    """(source, n_docs, n_distinct, dup_rate) — per-source duplication,
    the number a mixture planner weighs each source by. Distinct counts
    are a (source, hash) groupby (combiner collapses within-block repeats
    first); dup_rate is one exact-int float division (no rounding — the
    engine-parity contract)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def key_rows(batch: pa.Table) -> pa.Table:
        h1, h2 = batch_content_hash(batch.column("text"))
        t = pa.table(
            {
                "source": batch.column("source"),
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
            }
        )
        # within-block distinct (source, h) + per-key doc tally; NULL
        # source stays its own group (dropna=False — the SQL GROUP BY
        # keeps NULLs too)
        df = t.to_pandas().groupby(
            ["source", "h1", "h2"], sort=False, dropna=False
        ).size().reset_index(name="docs")
        # NULL source rides the shuffle as a NUL sentinel (Ray's sort-based
        # groupby cannot order None against str; real sources are normal
        # text, so NUL cannot collide) and decodes back to NULL at the end;
        # explicit schema so an all-NULL block cannot infer double
        import pandas as pd_

        src = [_NULL_SOURCE if pd_.isna(s) else s for s in df["source"]]
        return pa.table(
            {
                "source": pa.array(src, pa.string()),
                "h1": pa.array(df["h1"].to_numpy(np.int64), pa.int64()),
                "h2": pa.array(df["h2"].to_numpy(np.int64), pa.int64()),
                "docs": pa.array(df["docs"].to_numpy(np.int64), pa.int64()),
            }
        )

    per_key = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(key_rows, batch_format="pyarrow", **remote_kwargs())
        .groupby(["source", "h1", "h2"]).aggregate(Sum("docs"))
    )

    def rename(t: pa.Table) -> pa.Table:
        from .blockutil import retype_block

        return retype_block(
            t,
            {"source": ("source", pa.string()),
             "docs": ("sum(docs)", pa.int64())},
        )

    df = (
        per_key.map_batches(rename, batch_format="pyarrow", **remote_kwargs())
        .groupby("source").aggregate(Count(), Sum("docs"))
        .to_pandas()  # O(|sources|)
    )
    if len(df) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "n_distinct": pa.array([], pa.int64()),
             "dup_rate": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"count()": "n_distinct", "sum(docs)": "n_docs"})
    nd = df["n_docs"].to_numpy(np.float64)
    df["dup_rate"] = (nd - df["n_distinct"].to_numpy(np.float64)) / nd
    # decode the NUL sentinel back to a NULL source group (SQL parity)
    df["source"] = df["source"].where(df["source"] != _NULL_SOURCE, None)
    df = df.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["source", "n_docs", "n_distinct", "dup_rate"]],
        preserve_index=False,
    )


_DUP_RATE_SQL = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT coalesce(text, '')) AS n_distinct,
       (count(*) - count(DISTINCT coalesce(text, '')))
         / CAST(count(*) AS DOUBLE) AS dup_rate
FROM documents GROUP BY 1 ORDER BY 1
"""

register("dedup_group_stats", q_dedup_group_stats, _GROUP_STATS_SQL)
register("dedup_dup_rate_by_source", q_dup_rate_by_source, _DUP_RATE_SQL)


# ---------------------------------------------------------------------------
# incremental dedup — the continuous-crawl op: a newly crawled batch is
# admitted against the EXISTING corpus without rescoring old-vs-old pairs.
# Cohorts are deterministic from the table itself (doc_id % INCR_NEW_MOD
# == 0 is the "new batch"); a new doc survives iff no existing doc has its
# text AND it is the first (min doc_id) occurrence within the batch.
#
# 100-TB shape: ONE scan; each block pre-reduces to at most one
# (h1, h2, ex_min, new_min) row per distinct hash (np.minimum.reduceat),
# so the single hash-keyed groupby is the only exchange and it carries
# 4-int64 rows — never text. No broadcast of the existing-corpus hash set
# (that alternative is O(corpus) driver memory); the anti-join IS the
# groupby. Same Min-fold shape as dedup_exact, same NULL/text contract.
# ---------------------------------------------------------------------------

INCR_NEW_MOD = 10  # doc_id % 10 == 0 -> the newly crawled cohort (~10%)
_INT64_MAX = np.iinfo(np.int64).max


def _incr_partials(batch: pa.Table) -> pa.Table:
    """Per-block (h1, h2, ex_min, new_min) combiner rows — min existing /
    min new doc_id per distinct content hash (sentinel INT64_MAX = none)."""
    h1, h2 = batch_content_hash(batch.column("text"))
    h1 = h1.view(np.int64)
    h2 = h2.view(np.int64)
    did = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    is_new = (did % INCR_NEW_MOD) == 0
    ex = np.where(is_new, _INT64_MAX, did)
    nw = np.where(is_new, did, _INT64_MAX)
    order = np.lexsort((h2, h1))
    h1s, h2s = h1[order], h2[order]
    boundary = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    return pa.table(
        {
            "h1": pa.array(h1s[first], pa.int64()),
            "h2": pa.array(h2s[first], pa.int64()),
            "ex_min": pa.array(
                np.minimum.reduceat(ex[order], first), pa.int64()
            ),
            "new_min": pa.array(
                np.minimum.reduceat(nw[order], first), pa.int64()
            ),
        }
    )


def q_incremental_dedup(sf_dir: str):
    """doc_ids of new-batch docs that survive incremental dedup against the
    existing corpus (text unseen among existing docs, first within batch)."""
    from ray.data.aggregate import Min

    df = (
        _docs(sf_dir)
        .map_batches(_incr_partials, batch_format="pyarrow", **remote_kwargs())
        .groupby(["h1", "h2"])
        .aggregate(Min("ex_min", alias_name="ex_min"),
                   Min("new_min", alias_name="new_min"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    ex = df["ex_min"].to_numpy().astype(np.int64)
    nw = df["new_min"].to_numpy().astype(np.int64)
    keep = np.sort(nw[(ex == _INT64_MAX) & (nw != _INT64_MAX)])
    return pa.table({"doc_id": pa.array(keep, pa.int64())})


_INCR_SQL = f"""
WITH g AS (
  SELECT coalesce(text, '') AS t,
         min(CASE WHEN doc_id % {INCR_NEW_MOD} <> 0 THEN doc_id END) AS ex_min,
         min(CASE WHEN doc_id % {INCR_NEW_MOD} = 0 THEN doc_id END) AS new_min
  FROM documents GROUP BY 1)
SELECT new_min AS doc_id FROM g
WHERE ex_min IS NULL AND new_min IS NOT NULL
ORDER BY 1
"""

register("dedup_incremental", q_incremental_dedup, _INCR_SQL)


# ---------------------------------------------------------------------------
# containment near-dup — the ASYMMETRIC duplicate web text is full of:
# doc A embedded inside a larger doc B (quote pages, boilerplate wrappers,
# syndicated articles with added chrome). Jaccard misses these (a small A
# inside a big B has low |∩|/|∪|), and MinHash-LSH approximates Jaccard, so
# its buckets miss them too. Candidates here come from a RARE-SHINGLE
# inverted index instead: every distinct shingle held by at most
# CONTAINMENT_DF_CAP documents emits its C(g,2) doc pairs; pairs are
# deduped and verified exactly (containment = |∩| / min(|A|,|B|)) by the
# same chunk-pair pushdown-read machinery as the MinHash path.
#
# 100-TB shape: the index exchange is (shingle, doc_id) rows — linear in
# corpus tokens, the same cost class as the BM25/IDF index builds — and the
# SAMPLE mask (index only shingles with the low CONTAINMENT_SAMPLE_BITS of
# their hash zero) divides it by 2^bits with a recall trade documented
# here: a contained doc of W words still shares ~W/2^bits sampled shingles
# with its container, so recall loss only bites for very short docs.
# Common shingles (df > cap) emit nothing — boilerplate can't go quadratic.
# SQL-gated since round 5: sqlhash mirrors the internal hash domain
# integer-exactly, so the sampling/df-cap candidate rule is replicated AS
# IS in DuckDB (same sampled shingles, same posting lists, same pairs) and
# the gate is exact rather than probabilistic; recall of the rule itself is
# still pinned by the planted-containment and scalar-oracle tests.
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.9
CONTAINMENT_DF_CAP = 5
CONTAINMENT_SAMPLE_BITS = 3  # index 1/8 of the shingle space


def containment_index_batch(batch: pa.Table) -> pa.Table:
    """flat-map: (sh, doc_id) rows for each SAMPLED distinct shingle."""
    ids = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    sh, offs, n = _doc_shingles(batch)
    par = np.repeat(np.arange(n), np.diff(offs))
    mask = (sh & np.uint64((1 << CONTAINMENT_SAMPLE_BITS) - 1)) == 0
    return pa.table(
        {
            "sh": pa.array(sh[mask].view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[par[mask]], pa.int64()),
        }
    )


def _rare_shingle_pairs(group: pa.Table) -> pa.Table:
    """One shingle's posting list -> candidate pairs, empty if df > cap."""
    ids = (
        group.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    g = len(ids)
    if g < 2 or g > CONTAINMENT_DF_CAP:
        return pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64())}
        )
    ids = np.sort(ids)
    ai, bj = np.triu_indices(g, k=1)
    return pa.table(
        {"id_a": pa.array(ids[ai], pa.int64()),
         "id_b": pa.array(ids[bj], pa.int64())}
    )


def _containment_chunk_verify_fn(path: str, lo: int, chunk: int):
    """Chunk-pair exact verify (same pushdown shape as the MinHash verify,
    different accept rule): containment = |∩| / min(|A|, |B|)."""

    def _sets(tbl: pa.Table):
        ids = (
            tbl.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(ids, kind="stable")
        tbl = tbl.take(pa.array(order))
        return ids[order], *_doc_shingles(tbl)[:2]

    def _verify(group: pa.Table) -> pa.Table:
        a = group.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = group.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = int((a[0] - lo) // chunk)
        cb = int((b[0] - lo) // chunk)
        aids, ash, aoffs = _sets(_read_docs_range(
            path, lo + ca * chunk, lo + (ca + 1) * chunk))
        if cb == ca:
            bids, bsh, boffs = aids, ash, aoffs
        else:
            bids, bsh, boffs = _sets(_read_docs_range(
                path, lo + cb * chunk, lo + (cb + 1) * chunk))
        ia = np.searchsorted(aids, a)
        ib = np.searchsorted(bids, b)
        la = aoffs[ia + 1] - aoffs[ia]
        lb = boffs[ib + 1] - boffs[ib]
        inter = _pair_intersection_counts(ash, aoffs, ia, bsh, boffs, ib)
        ok = (la > 0) & (lb > 0)
        cont = np.zeros(len(a))
        cont[ok] = inter[ok] / np.minimum(la, lb)[ok]
        keep = cont >= CONTAINMENT_THRESHOLD
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "containment": pa.array(
                    np.round(cont[keep], 6), pa.float64()
                ),
            }
        )

    return _verify


def q_containment_pairs(sf_dir: str):
    """(id_a, id_b, containment >= 0.9) — asymmetric doc-inside-doc pairs
    from the rare-shingle index, verified exactly per chunk pair."""
    from ..parquet_stats import column_stats_bounds, file_num_rows

    path = _docs_path(sf_dir)
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "containment": pa.array([], pa.float64())}
    )
    if file_num_rows(path) == 0:
        return empty
    cand = (
        _docs(sf_dir)
        .map_batches(containment_index_batch, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("sh")
        .map_groups(_rare_shingle_pairs, batch_format="pyarrow",
                    **remote_kwargs())
    )
    uniq = cand.groupby(["id_a", "id_b"]).count()
    lo_f, _hi_f = column_stats_bounds(path, "doc_id")
    lo, chunk = int(lo_f), MINHASH_CHUNK_DOCS

    def chunk_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return pa.table(
                {"ca": pa.array([], pa.int64()), "cb": pa.array([], pa.int64()),
                 "id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64())}
            )
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"ca": pa.array((a - lo) // chunk, pa.int64()),
             "cb": pa.array((b - lo) // chunk, pa.int64()),
             "id_a": pa.array(a, pa.int64()),
             "id_b": pa.array(b, pa.int64())}
        )

    keyed = uniq.map_batches(chunk_keys, batch_format="pyarrow",
                             **remote_kwargs())
    pairs = keyed.groupby(["ca", "cb"]).map_groups(
        _containment_chunk_verify_fn(path, lo, chunk),
        batch_format="pyarrow", **remote_kwargs()
    )
    df = pairs.to_pandas()
    if len(df) == 0:
        return empty
    df = df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["id_a", "id_b", "containment"]], preserve_index=False
    )


def _containment_sql() -> str:
    """Exact DuckDB mirror of q_containment_pairs: the SAME candidate rule
    (sampled distinct shingles, posting lists with 2 <= df <= cap, all
    pairs) — not a relaxation — then exact containment |A∩B| / min(|A|,|B|)
    over the full distinct shingle sets. Only the ``shingles`` CTE of the
    MinHash core is referenced; DuckDB prunes the unreferenced
    signature/banding CTEs, so the mirror costs O(shingles), not O(64x)."""
    samp_mask = (1 << CONTAINMENT_SAMPLE_BITS) - 1
    return f"""
WITH RECURSIVE
{_minhash_core_ctes()},
samp AS (SELECT doc_id, sh FROM shingles
         WHERE (sh & {samp_mask}::HUGEINT) = 0::HUGEINT),
plist AS (SELECT sh FROM samp GROUP BY sh
          HAVING count(*) BETWEEN 2 AND {CONTAINMENT_DF_CAP}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM plist p
  JOIN samp a ON a.sh = p.sh
  JOIN samp b ON b.sh = p.sh AND a.doc_id < b.doc_id),
ssz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
pint AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.id_a
  JOIN shingles sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
  GROUP BY 1, 2)
SELECT p.id_a, p.id_b,
       round(p.i::DOUBLE / least(za.sz, zb.sz), 6) AS containment
FROM pint p
JOIN ssz za ON za.doc_id = p.id_a
JOIN ssz zb ON zb.doc_id = p.id_b
WHERE p.i::DOUBLE / least(za.sz, zb.sz) >= {CONTAINMENT_THRESHOLD}
ORDER BY 1, 2
"""


register("dedup_containment_pairs", q_containment_pairs, _containment_sql())


# ---------------------------------------------------------------------------
# dup rate x length quartile — the corpus-QA cross report ("are short docs
# more duplicated?") composing the bounded-distribution quantile engine
# (global char-length quartile boundaries, driver-held 3 ints) with the
# exact-dedup hash groupby. Identical texts have identical length, so the
# bucket rides the (h1, h2) group for free: ONE corpus-scale exchange (the
# same hash groupby dedup_exact runs), then block partials collapse the
# per-text table to (bucket, n_docs, n_dup_docs) cells and a 4-row groupby
# finishes. Boundary semantics are the repo's order-statistic contract
# (rank ((n-1)*p)//100), mirrored in SQL via row_number.
# ---------------------------------------------------------------------------

def q_dup_rate_by_length_quartile(sf_dir: str):
    """(bucket 0-3, n_docs, n_dup_docs, dup_rate) by global length quartile."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Min

    from .quantiles import _dist_partials, _grouped_quantiles

    def len_partials(batch: pa.Table) -> pa.Table:
        v = pc.utf8_length(
            pc.fill_null(batch.column("text"), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return _dist_partials(
            np.full(len(v), "all", dtype=object).astype(str), v, "k"
        )

    empty = pa.table(
        {"bucket": pa.array([], pa.int64()),
         "n_docs": pa.array([], pa.int64()),
         "n_dup_docs": pa.array([], pa.int64()),
         "dup_rate": pa.array([], pa.float64())}
    )
    qdf = _grouped_quantiles(
        _docs(sf_dir, columns=("text",)), len_partials, "k"
    )
    if isinstance(qdf, pa.Table):  # empty corpus
        return empty
    p25, p50, p75 = (int(qdf["p25"][0]), int(qdf["p50"][0]),
                     int(qdf["p75"][0]))

    def hash_bucket(batch: pa.Table) -> pa.Table:
        h1, h2 = batch_content_hash(batch.column("text"))
        v = pc.utf8_length(
            pc.fill_null(batch.column("text"), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.full(len(v), 3, dtype=np.int64)
        bucket[v <= p75] = 2
        bucket[v <= p50] = 1
        bucket[v <= p25] = 0
        return pa.table(
            {"h1": pa.array(h1.view(np.int64), pa.int64()),
             "h2": pa.array(h2.view(np.int64), pa.int64()),
             "bucket": pa.array(bucket, pa.int64())}
        )

    def cell_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "count()" not in t.column_names:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "n_docs": pa.array([], pa.int64()),
                 "n_dup_docs": pa.array([], pa.int64())}
            )
        b = (
            t.column("min(bucket)").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        c = (
            t.column("count()").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dup = np.where(c >= 2, c, 0)
        order = np.argsort(b, kind="stable")
        b_s, c_s, d_s = b[order], c[order], dup[order]
        first = np.flatnonzero(np.concatenate([[True], b_s[1:] != b_s[:-1]]))
        return pa.table(
            {"bucket": pa.array(b_s[first], pa.int64()),
             "n_docs": pa.array(np.add.reduceat(c_s, first), pa.int64()),
             "n_dup_docs": pa.array(np.add.reduceat(d_s, first), pa.int64())}
        )

    df = (
        _docs(sf_dir, columns=("text",))
        .map_batches(hash_bucket, batch_format="pyarrow", **remote_kwargs())
        .groupby(["h1", "h2"])
        .aggregate(Count(), Min("bucket"))
        .map_batches(cell_partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("bucket")
        .sum(["n_docs", "n_dup_docs"])
        .to_pandas()  # <= 4 rows
    )
    if len(df) == 0 or "bucket" not in df.columns:
        return empty
    nd = df["sum(n_docs)"].to_numpy().astype(np.int64)
    dd = df["sum(n_dup_docs)"].to_numpy().astype(np.int64)
    out = pa.table(
        {
            "bucket": pa.array(
                df["bucket"].to_numpy().astype(np.int64), pa.int64()
            ),
            "n_docs": pa.array(nd, pa.int64()),
            "n_dup_docs": pa.array(dd, pa.int64()),
            "dup_rate": pa.array(
                np.round(dd / np.maximum(nd, 1), 6), pa.float64()
            ),
        }
    )
    return out.sort_by([("bucket", "ascending")])


_DUP_LENQ_SQL = """
WITH v AS (SELECT length(coalesce(text, '')) AS vm FROM documents),
r AS (SELECT vm, row_number() OVER (ORDER BY vm) - 1 AS rk FROM v),
n AS (SELECT count(*) AS n FROM v),
b AS (SELECT max(CASE WHEN rk = ((n.n - 1) * 25) // 100 THEN vm END) AS p25,
             max(CASE WHEN rk = ((n.n - 1) * 50) // 100 THEN vm END) AS p50,
             max(CASE WHEN rk = ((n.n - 1) * 75) // 100 THEN vm END) AS p75
      FROM r, n),
d AS (SELECT coalesce(text, '') AS t,
             CASE WHEN length(coalesce(text, '')) <= b.p25 THEN 0
                  WHEN length(coalesce(text, '')) <= b.p50 THEN 1
                  WHEN length(coalesce(text, '')) <= b.p75 THEN 2
                  ELSE 3 END AS bucket
      FROM documents, b),
g AS (SELECT t, min(bucket) AS bucket, count(*) AS c FROM d GROUP BY 1)
SELECT bucket, CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_docs,
       round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
             / CAST(sum(c) AS DOUBLE), 6) AS dup_rate
FROM g GROUP BY 1 ORDER BY 1
"""

register("dedup_rate_by_length_quartile", q_dup_rate_by_length_quartile,
         _DUP_LENQ_SQL)
