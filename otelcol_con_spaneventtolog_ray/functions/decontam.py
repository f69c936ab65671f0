"""Benchmark decontamination — flag training documents that share any word
n-gram with a held-out benchmark set (the GPT-3/PaLM-style "13-gram
overlap" decontamination recipe, scaled down to this corpus's short docs).

Scale shape: the benchmark set is small by definition (an eval suite), so
its DISTINCT n-gram hashes are collected once — a column-pruned scan whose
per-batch output is already deduped hashes, folded to one sorted uint64
array on the driver — and broadcast via ``ray.put``. Scoring is then an
embarrassingly parallel ``map_batches`` pass: vectorized shingle hashing
(texthash.batch_shingles, the same kernel MinHash uses), one
``np.isin``-style membership probe against the broadcast sorted array
(searchsorted), and a per-doc segment sum. No shuffle anywhere; the
broadcast is O(|benchmark n-grams|), shipped once per worker.

SQL-gated (round 4): the oracle builds the word n-grams as STRINGS —
space-joined token windows, which is injective because tokens are
whitespace-free — while the Ray side matches 64-bit shingle hashes of the
same windows; a divergence needs a splitmix64 shingle-hash collision
(~1e-11 at 1e4 distinct grams). Also pinned in pytest against an exact
scalar-mirror oracle (word_shingles with the same k), including planted
contamination.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .entry_queries import register, register_lazy_sql
from .texthash import batch_shingles, batch_words
from ..rayenv import remote_kwargs

#: word n-gram size — the published recipes use 8-13 for web pages; the
#: synthetic docs are 20-80 words, so 5 keeps nearly every doc eligible
#: while random cross-doc collisions stay negligible
DECON_K = 5

#: deterministic benchmark set: doc_id % DECON_BENCH_MOD == 0, capped to
#: the first DECON_BENCH_CAP eligible ids (a stand-in for an eval suite
#: living in its own table; swap is_bench_ids/bench_pred_sql to point at
#: one). Real suites are FIXED-size, so the broadcast index must stay
#: O(|benchmark|) REGARDLESS of sf: the mod selector alone would make the
#: stand-in 10% of the corpus (unbounded ray.put of 10% of all text at
#: large sf), so the id cap bounds it at <= DECON_BENCH_CAP docs. 10 (not
#: a sparser mod) so the suite intersects the corpus's planted near-dup
#: pairs and the fuzzy path below is exercised end-to-end on the driver
#: tables; the cap binds only above ~100k docs (sf >> 0.1), so every
#: gate-scale result is unchanged.
DECON_BENCH_MOD = 10
DECON_BENCH_CAP = 10_000


def is_bench_ids(ids: np.ndarray) -> np.ndarray:
    """Boolean benchmark-membership mask — THE single Python home of the
    bench predicate; bench_pred_sql is its DuckDB twin."""
    return (ids % DECON_BENCH_MOD == 0) & (ids < DECON_BENCH_MOD * DECON_BENCH_CAP)


def bench_pred_sql(col: str = "doc_id") -> str:
    """SQL benchmark-membership predicate, exactly mirroring is_bench_ids."""
    return (
        f"({col} % {DECON_BENCH_MOD} = 0 "
        f"AND {col} < {DECON_BENCH_MOD * DECON_BENCH_CAP})"
    )


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _doc_ngram_hashes(batch: pa.Table, k: int):
    """(hashes:uint64, offs:int64[n+1]) distinct k-gram hashes per doc."""
    wh, _parents, woffs = batch_words(batch.column("text"))
    sh, par = batch_shingles(wh, woffs, k)
    n = batch.num_rows
    if len(sh) == 0:
        return sh, np.zeros(n + 1, dtype=np.int64)
    order = np.lexsort((sh, par))
    sh, par = sh[order], par[order]
    keep = np.ones(len(sh), dtype=bool)
    keep[1:] = (sh[1:] != sh[:-1]) | (par[1:] != par[:-1])
    sh, par = sh[keep], par[keep]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(par, minlength=n), out=offs[1:])
    return sh, offs


def benchmark_ngram_hashes(sf_dir: str, k: int = DECON_K) -> np.ndarray:
    """Sorted distinct uint64 n-gram hashes of the benchmark docs. Each
    batch emits its benchmark docs' DEDUPED hashes (tiny), the driver folds
    them with one np.unique — O(|benchmark|), not O(corpus)."""

    def bench_hashes(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sel = is_bench_ids(ids)
        if not sel.any():
            return pa.table({"h": pa.array([], pa.int64())})
        sh, _offs = _doc_ngram_hashes(batch.filter(pa.array(sel)), k)
        return pa.table({"h": pa.array(np.unique(sh).view(np.int64), pa.int64())})

    df = (
        _docs(sf_dir)
        .map_batches(bench_hashes, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    return np.unique(df["h"].to_numpy().view(np.uint64))


def q_decontaminate(sf_dir: str):
    """(doc_id, is_benchmark, n_hits, contaminated) for every document:
    n_hits = how many of the doc's distinct word DECON_K-grams appear in
    the benchmark set; contaminated = any hit on a non-benchmark doc."""
    import ray

    bench_ref = ray.put(benchmark_ngram_hashes(sf_dir))

    def score(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        sh, offs = _doc_ngram_hashes(batch, DECON_K)
        if len(sh) and len(bench):
            pos = np.searchsorted(bench, sh)
            # pos == len(bench) means sh > every benchmark hash, so the
            # clamped probe at 0 can never false-positive
            pos[pos == len(bench)] = 0
            hit = (bench[pos] == sh).astype(np.int64)
        else:
            hit = np.zeros(len(sh), dtype=np.int64)
        counts = np.diff(offs)
        n_hits = np.zeros(batch.num_rows, dtype=np.int64)
        present = np.flatnonzero(counts > 0)
        if len(present) and len(hit):
            n_hits[present] = np.add.reduceat(hit, offs[present])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        is_bench = is_bench_ids(ids)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "is_benchmark": pa.array(is_bench, pa.bool_()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array((n_hits > 0) & ~is_bench, pa.bool_()),
            }
        )

    return _docs(sf_dir).map_batches(
        score, batch_format="pyarrow", **remote_kwargs()
    )


# string n-grams: space-joined token windows (injective — tokens contain no
# whitespace). Mirrors batch_shingles exactly: >=K words -> one gram per
# window, 0<len<K -> ONE gram over all words, empty -> none; distinct per
# doc; docs with no grams still appear with n_hits = 0.
def _word_gram_cte(k: int) -> str:
    """The shared t/g CTE: whitespace tokens, then per-doc DISTINCT word
    k-gram strings with the batch_shingles convention (>= k words -> one
    gram per window; 0 < len < k -> ONE gram over all words; empty ->
    none). Single source of truth for BOTH SQL mirrors (_DECON_SQL and
    _DUP_SPAN_SQL) so the window semantics cannot desynchronize."""
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(coalesce(text, ''), '[ \\t\\n\\r\\x0b\\x0c]+'),
                             x -> x != '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, list_distinct(CASE
    WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
    WHEN len(toks) < {k} THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(1, len(toks) - {k} + 2),
                        i -> array_to_string(
                               list_slice(toks, i, i + {k} - 1), ' '))
    END) AS grams
  FROM t)"""


_DECON_SQL = _word_gram_cte(DECON_K) + f""",
b AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      WHERE {bench_pred_sql()}),
e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
h AS (SELECT e.doc_id, count(b.gram) AS n_hits
      FROM e LEFT JOIN b USING (gram) GROUP BY 1)
SELECT t.doc_id,
       {bench_pred_sql('t.doc_id')} AS is_benchmark,
       coalesce(h.n_hits, 0) AS n_hits,
       (coalesce(h.n_hits, 0) > 0 AND NOT {bench_pred_sql('t.doc_id')})
         AS contaminated
FROM t LEFT JOIN h USING (doc_id)
"""

register("text_decontaminate", q_decontaminate, _DECON_SQL)


# ---------------------------------------------------------------------------
# duplicated-span profiling — the corpus-vs-ITSELF counterpart of
# decontamination (substring-level dedup a la "Deduplicating Training Data
# Makes Language Models Better": a window shared by >= 2 documents is
# memorization fuel). Per doc: how many of its distinct word DUP_SPAN_K-gram
# windows also occur in at least one OTHER document.
#
# Scale shape — no broadcast, no per-group Python: the distinct
# (window-hash, doc_id) fan-out is SORTED by hash (the one inherent
# corpus-sized exchange of substring dedup), and one vectorized fold per
# block marks every row whose hash-run has length >= 2 — the sort's range
# partitioning co-locates equal hashes in one block (the property pinned by
# test_sort_colocates_equal_keys_in_one_block), so a run never spans
# blocks. Per-doc window totals never shuffle (each doc is one input row);
# the two partial streams union into ONE tiny groupby(doc_id).
# ---------------------------------------------------------------------------

DUP_SPAN_K = 10

#: equal hashes co-locate in ONE block under the sort (the property the
#: fold relies on) — so a single window shared by tens of millions of
#: documents would concentrate that many 16-byte rows into one block.
#: Fail fast well before that instead of letting the executor OOM: a
#: corpus with such a window needs text_line_dedup / dedup_exact first.
DUP_SPAN_MAX_RUN = 20_000_000


def q_dup_spans(sf_dir: str):
    """(doc_id, n_windows, n_dup_windows, dup_fraction) per document, where
    a window counts as duplicated iff it appears in >= 2 DISTINCT documents
    (a doc repeating its own window is exact-dedup's business, not span
    dedup's — pinned in pytest)."""
    import ray.data

    def fanout(batch: pa.Table) -> pa.Table:
        sh, offs = _doc_ngram_hashes(batch, DUP_SPAN_K)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h": pa.array(sh.view(np.int64), pa.int64()),
                "doc_id": pa.array(
                    np.repeat(ids, np.diff(offs)), pa.int64()
                ),
            }
        )

    def mark_runs(t: pa.Table) -> pa.Table:
        """doc partial counts for rows in hash-runs of length >= 2."""
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "nw": pa.array([], pa.int64()),
             "nd": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        h = t.column("h").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
        lens = np.diff(np.append(starts, len(h)))
        if len(lens) and int(lens.max()) > DUP_SPAN_MAX_RUN:
            raise ValueError(
                f"one {DUP_SPAN_K}-gram window occurs in {int(lens.max())}"
                f" documents (cap {DUP_SPAN_MAX_RUN}): a boilerplate span"
                " this common concentrates its fan-out rows in one sort"
                " partition. Remove corpus-wide boilerplate first"
                " (text_line_dedup / dedup_exact) or raise"
                " decontam.DUP_SPAN_MAX_RUN deliberately."
            )
        dup = np.repeat(lens >= 2, lens)
        dd = d[dup]
        if len(dd) == 0:
            return empty
        uniq, _inv, cnt = np.unique(dd, return_inverse=True,
                                    return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "nw": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
                "nd": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def totals(batch: pa.Table) -> pa.Table:
        sh, offs = _doc_ngram_hashes(batch, DUP_SPAN_K)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "nw": pa.array(np.diff(offs), pa.int64()),
                "nd": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
            }
        )

    dup_partials = (
        _docs(sf_dir)
        .map_batches(fanout, batch_format="pyarrow", **remote_kwargs())
        .sort("h")
        .map_batches(mark_runs, batch_format="pyarrow", batch_size=None,
                     **remote_kwargs())
    )
    tot = _docs(sf_dir).map_batches(
        totals, batch_format="pyarrow", **remote_kwargs()
    )

    def finish(t: pa.Table) -> pa.Table:
        nw = t.column("sum(nw)").to_numpy(zero_copy_only=False).astype(np.int64)
        nd = t.column("sum(nd)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_windows": pa.array(nw, pa.int64()),
                "n_dup_windows": pa.array(nd, pa.int64()),
                "dup_fraction": pa.array(
                    np.round(nd / np.maximum(nw, 1), 6), pa.float64()
                ),
            }
        )

    return (
        tot.union(dup_partials)
        .groupby("doc_id")
        .sum(["nw", "nd"])
        .map_batches(finish, batch_format="pyarrow", **remote_kwargs())
    )


# string-window mirror via the shared gram CTE (same injectivity
# argument as _DECON_SQL); count(*) over per-doc-DISTINCT grams =
# number of distinct docs containing the gram
_DUP_SPAN_SQL = _word_gram_cte(DUP_SPAN_K) + f""",
e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
c AS (SELECT gram FROM e GROUP BY 1 HAVING count(*) >= 2),
h AS (SELECT e.doc_id, count(c.gram) AS nd
      FROM e LEFT JOIN c USING (gram) GROUP BY 1)
SELECT g.doc_id, len(g.grams) AS n_windows,
       coalesce(h.nd, 0) AS n_dup_windows,
       round(coalesce(h.nd, 0) / CAST(greatest(len(g.grams), 1) AS DOUBLE),
             6) AS dup_fraction
FROM g LEFT JOIN h USING (doc_id)
"""

register("text_dup_spans", q_dup_spans, _DUP_SPAN_SQL)


# ---------------------------------------------------------------------------
# cross-source n-gram overlap matrix — the corpus-curation "leakage report":
# for every pair of sources, how many distinct word SOURCE_OVERLAP_K-grams
# they share, plus each side's distinct-gram total and the pair's Jaccard.
# High overlap between a training source and a held-out source means the
# split leaks; between two training sources it means double-weighted text.
#
# Scale shape — only (gram-hash, source-code) rows ever shuffle, never text:
# 1. map_batches: vectorized shingle hashing (the decontam kernel) -> the
#    block's DISTINCT (hash, code) pairs (one lexsort + boundary mask;
#    sources enumerated once from a column-pruned scan, <=
#    SOURCE_OVERLAP_MAX_SOURCES so a gram's source set fits one int64
#    bitmask).
# 2. sort("h") — the ONE corpus-sized exchange, the same sort-co-partition
#    join dup_spans uses (equal hashes land in one block, pinned by
#    test_sort_colocates_equal_keys_in_one_block; a run is structurally
#    <= S x input-blocks rows). Replaces two hash groupbys measured 5-7x
#    slower at 5M fan-out rows.
# 3. ONE vectorized fold per sorted block: per-run bitwise_or.reduceat
#    builds each gram's source-set mask (cross-block duplicates of
#    (hash, code) collapse here — OR is idempotent), then one
#    (S x runs) @ (runs x S) integer gemm emits the block's S x S
#    co-occurrence partial (diag = per-source distinct-gram totals).
# 4. a tiny groupby over <= S^2 rows folds the partials; only the S x S
#    matrix reaches the driver.
# ---------------------------------------------------------------------------

SOURCE_OVERLAP_K = 3

#: the per-gram source set rides one int64 bitmask; a corpus with more
#: sources than bits needs the matrix chunked by source-code range anyway
#: (S^2 pairs stop being a "tiny report" long before the mask overflows)
SOURCE_OVERLAP_MAX_SOURCES = 62


def q_source_overlap(sf_dir: str):
    """(src_a, src_b, n_common, n_a, n_b, jaccard) for every source pair
    (src_a < src_b) sharing at least one distinct word 3-gram. Hash-vs-
    string parity: same injectivity argument as _DECON_SQL."""
    import ray.data

    empty = pa.table(
        {"src_a": pa.array([], pa.string()),
         "src_b": pa.array([], pa.string()),
         "n_common": pa.array([], pa.int64()),
         "n_a": pa.array([], pa.int64()),
         "n_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )

    path = os.path.join(sf_dir, "documents.parquet")

    def src_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"source": batch.column("source").drop_null().unique()}
        )

    src_rows = (
        ray.data.read_parquet(path, columns=["source"])
        .map_batches(src_partial, batch_format="pyarrow", **remote_kwargs())
        .groupby("source")
        .count()
        .to_pandas()
    )
    if "source" not in src_rows.columns:  # empty corpus loses the schema
        return empty
    sources = sorted(s for s in src_rows["source"] if s is not None)
    if not sources:
        return empty
    if len(sources) > SOURCE_OVERLAP_MAX_SOURCES:
        raise ValueError(
            f"corpus_source_overlap supports at most "
            f"{SOURCE_OVERLAP_MAX_SOURCES} sources (got {len(sources)}): "
            "the per-gram source set is one int64 bitmask and the S^2 pair "
            "matrix stops being a tiny report long before that — chunk the "
            "matrix by source group instead"
        )
    src_arr = np.array(sources, dtype=object)
    n_src = len(sources)

    def fanout(batch: pa.Table) -> pa.Table:
        ok = batch.column("source").is_valid()
        batch = batch.filter(ok)
        sh, offs = _doc_ngram_hashes(batch, SOURCE_OVERLAP_K)
        if len(sh) == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()),
                 "code": pa.array([], pa.int64())}
            )
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        code = np.searchsorted(src_arr.astype(str), src.astype(str))
        gcode = np.repeat(code.astype(np.int64), np.diff(offs))
        hs = sh.view(np.int64)
        order = np.lexsort((hs, gcode))
        hs, gcode = hs[order], gcode[order]
        keep = np.ones(len(hs), dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (gcode[1:] != gcode[:-1])
        return pa.table(
            {"h": pa.array(hs[keep], pa.int64()),
             "code": pa.array(gcode[keep], pa.int64())}
        )

    def run_fold(t: pa.Table) -> pa.Table:
        """Sorted block -> per-run source-set OR -> S x S gemm partial.

        BOUNDARY-SAFE: a block's FIRST and LAST runs may be halves of a
        run split across neighboring blocks (Ray re-splits big sorted
        partitions at target_max_block_size), so those two runs are NOT
        folded here — their raw (h, code) rows are emitted to a tiny
        side-channel (ia = -1; <= 2 runs x S rows per block, bounded by
        block count not data size) and folded exactly once at the end.
        Interior runs are globally complete by construction: their h
        differs from in-block neighbors on both sides."""
        if t.num_rows == 0:
            return pa.table(
                {"ia": pa.array([], pa.int64()),
                 "ib": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        h = t.column("h").to_numpy(zero_copy_only=False)
        code = (
            t.column("code").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(h, kind="stable")
        h, code = h[order], code[order]
        starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
        ends = np.append(starts[1:], len(h))
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = True
        edge[-1] = True
        side_rows = np.concatenate(
            [np.arange(starts[i], ends[i]) for i in np.flatnonzero(edge)]
        )
        inner = np.flatnonzero(~edge)
        # side-channel key is (ia = -(code+1), ib = h): the downstream
        # groupby((ia, ib)) then DEDUPES exact (code, h) pairs (presence
        # is the datum; the summed n is discarded)
        cols = {
            "ia": -(code[side_rows] + 1),
            "ib": h[side_rows],
            "n": np.ones(len(side_rows), np.int64),
        }
        if len(inner):
            masks = np.bitwise_or.reduceat(
                np.int64(1) << code, starts
            )[inner]
            bits = ((masks[:, None] >> np.arange(n_src)) & 1).astype(np.int64)
            co = bits.T @ bits  # (S, S): diag = per-source distinct totals
            iu, ju = np.triu_indices(n_src)  # includes the diagonal
            cols = {
                "ia": np.concatenate([cols["ia"], iu.astype(np.int64)]),
                "ib": np.concatenate([cols["ib"], ju.astype(np.int64)]),
                "n": np.concatenate([cols["n"], co[iu, ju]]),
            }
        return pa.table(
            {"ia": pa.array(cols["ia"], pa.int64()),
             "ib": pa.array(cols["ib"], pa.int64()),
             "n": pa.array(cols["n"], pa.int64())}
        )

    incidence = (
        ray.data.read_parquet(path, columns=["doc_id", "text", "source"])
        .map_batches(fanout, batch_format="pyarrow", **remote_kwargs())
        .sort("h")
        .map_batches(run_fold, batch_format="pyarrow", batch_size=None,
                     **remote_kwargs())
        .groupby(["ia", "ib"])
        .sum("n")
        .to_pandas()
    )
    if len(incidence) == 0:
        return empty
    folded = np.zeros((n_src, n_src), dtype=np.int64)
    # fold the side-channel exactly once: boundary (code, h) pairs ride
    # the same groupby as the gemm partials (deduped by key), then one
    # per-h OR + gemm here adds their contribution.
    side = incidence[incidence["ia"] < 0]
    incidence = incidence[incidence["ia"] >= 0]
    if len(side):
        sh = side["ib"].to_numpy()
        sc = (-side["ia"].to_numpy() - 1).astype(np.int64)
        order = np.argsort(sh, kind="stable")
        sh, sc = sh[order], sc[order]
        sstarts = np.flatnonzero(
            np.concatenate([[True], sh[1:] != sh[:-1]])
        )
        masks = np.bitwise_or.reduceat(np.int64(1) << sc, sstarts)
        bits = ((masks[:, None] >> np.arange(n_src)) & 1).astype(np.int64)
        folded += bits.T @ bits
    folded[incidence["ia"], incidence["ib"]] += incidence["sum(n)"]
    totals = np.diag(folded).copy()
    iu, ju = np.triu_indices(n_src, k=1)
    common = folded[iu, ju]
    nz = common > 0
    iu, ju, common = iu[nz], ju[nz], common[nz]
    na, nb = totals[iu], totals[ju]
    return pa.table(
        {
            "src_a": pa.array(src_arr[iu], pa.string()),
            "src_b": pa.array(src_arr[ju], pa.string()),
            "n_common": pa.array(common, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "jaccard": pa.array(
                np.round(common / (na + nb - common), 6), pa.float64()
            ),
        }
    )


_SOURCE_OVERLAP_SQL = _word_gram_cte(SOURCE_OVERLAP_K) + """,
e AS (SELECT DISTINCT d.source AS source, x.gram AS gram
      FROM g JOIN documents d USING (doc_id),
           LATERAL (SELECT unnest(g.grams) AS gram) x
      WHERE d.source IS NOT NULL),
n AS (SELECT source, count(*) AS n FROM e GROUP BY 1),
p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM e a JOIN e b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2)
SELECT p.src_a, p.src_b, p.n_common, na.n AS n_a, nb.n AS n_b,
       round(p.n_common / CAST(na.n + nb.n - p.n_common AS DOUBLE), 6)
         AS jaccard
FROM p JOIN n na ON na.source = p.src_a JOIN n nb ON nb.source = p.src_b
"""

register("corpus_source_overlap", q_source_overlap, _SOURCE_OVERLAP_SQL)


# ---------------------------------------------------------------------------
# FUZZY benchmark decontamination — exact n-gram overlap (text_decontaminate
# above) misses lightly edited benchmark copies; this is the MinHash-LSH
# variant: flag training docs whose shingle-set Jaccard against ANY
# benchmark doc clears FUZZY_JACCARD_T. Banding is re-tuned for the 0.5
# threshold: the dedup pass's 8 bands x 8 rows detects j=0.5 pairs with
# probability ~3%, so this op folds the same 64-permutation signature into
# 32 bands x 2 rows (detect probability 1 - 0.75^32 ≈ 0.9999 at j=0.5).
#
# Scale shape: the benchmark index (band-bucket CSR + shingle CSR) is
# broadcast once via ray.put — O(|benchmark|), small by definition; scoring
# is an embarrassingly parallel map_batches pass (vectorized signatures,
# one searchsorted probe, candidate pairs verified with the rank-packed
# sorted-merge intersection — no per-pair Python). No shuffle anywhere.
# Threshold compares as exact integers (3*inter >= |a|+|b| ⇔ j >= 0.5).
# ---------------------------------------------------------------------------

FUZZY_BANDS = 32  # 2 rows per band over the 64-permutation signature
FUZZY_JACCARD_T_NUM = 1  # threshold 1/2 — see the integer form below


def _fuzzy_band_buckets(sig: np.ndarray) -> np.ndarray:
    """(n, FUZZY_BANDS) int64 bucket keys: 2-row polynomial fold + mix."""
    from .texthash import WORD_BASE, _splitmix64

    n = sig.shape[0]
    rows = sig.shape[1] // FUZZY_BANDS
    out = np.empty((n, FUZZY_BANDS), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(FUZZY_BANDS):
            h = np.zeros(n, dtype=np.uint64)
            for r in range(rows):
                h = h * WORD_BASE + sig[:, b * rows + r]
            out[:, b] = _splitmix64(h)
    return out.view(np.int64)


def _fuzzy_benchmark_index(sf_dir: str):
    """Driver-side benchmark index: (sorted bucket keys, CSR offsets,
    bench row per entry), bench shingle CSR, bench doc ids."""
    from .dedup import _doc_shingles, _minhash_sigs

    def _bench_filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(is_bench_ids(ids)))

    bench = (
        _docs(sf_dir)
        .map_batches(_bench_filter, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()  # |docs| / DECON_BENCH_MOD rows — benchmark-small
    )
    if len(bench) == 0:
        z = np.array([], np.int64)
        return (z, np.zeros(1, np.int64), z, np.array([], np.uint64),
                np.zeros(1, np.int64), z)
    tbl = pa.table(
        {"doc_id": pa.array(bench["doc_id"].to_numpy(np.int64), pa.int64()),
         "text": pa.array(bench["text"].astype(str), pa.string())}
    )
    sh, offs, n = _doc_shingles(tbl)
    sigs = _minhash_sigs(sh, offs, n)
    bb = _fuzzy_band_buckets(sigs)
    keys = bb.ravel()
    rows = np.repeat(np.arange(n, dtype=np.int64), FUZZY_BANDS)
    order = np.lexsort((rows, keys))
    keys_s, rows_s = keys[order], rows[order]
    keep = np.ones(len(keys_s), dtype=bool)  # dedupe (key, row)
    keep[1:] = (keys_s[1:] != keys_s[:-1]) | (rows_s[1:] != rows_s[:-1])
    keys_s, rows_s = keys_s[keep], rows_s[keep]
    first = np.flatnonzero(
        np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
    ) if len(keys_s) else np.array([], np.int64)
    ukeys = keys_s[first] if len(keys_s) else keys_s
    koffs = np.append(first, len(keys_s)).astype(np.int64)
    bids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return ukeys, koffs, rows_s, sh, offs, bids


def q_decontaminate_fuzzy(sf_dir: str):
    """(doc_id, bench_doc_id, jaccard) for every training doc whose shingle
    Jaccard vs a benchmark doc is >= 0.5 (benchmark docs themselves and
    empty-shingle docs excluded)."""
    import ray

    idx_ref = ray.put(_fuzzy_benchmark_index(sf_dir))

    def score(batch: pa.Table) -> pa.Table:
        from .dedup import (
            _doc_shingles,
            _minhash_sigs,
            _pair_intersection_counts,
            _ragged_ranges,
        )

        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "bench_doc_id": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
        ukeys, koffs, rows_s, bsh, boffs, bids = ray.get(idx_ref)
        if len(ukeys) == 0 or batch.num_rows == 0:
            return empty
        sh, offs, n = _doc_shingles(batch)
        sigs = _minhash_sigs(sh, offs, n)
        bb = _fuzzy_band_buckets(sigs).ravel()
        doc_of = np.repeat(np.arange(n, dtype=np.int64), FUZZY_BANDS)
        pos = np.minimum(np.searchsorted(ukeys, bb), len(ukeys) - 1)
        hit = ukeys[pos] == bb
        hp, hd = pos[hit], doc_of[hit]
        counts = koffs[hp + 1] - koffs[hp]
        pair_doc = np.repeat(hd, counts)
        pair_bench = rows_s[_ragged_ranges(koffs[hp], counts)]
        if len(pair_doc) == 0:
            return empty
        # dedupe (doc, bench) pairs found by multiple bands
        pk = pair_doc * np.int64(len(bids)) + pair_bench
        _, ui = np.unique(pk, return_index=True)
        pair_doc, pair_bench = pair_doc[ui], pair_bench[ui]
        ids = (
            batch.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # benchmark docs are not training docs (docstring contract; also
        # drops the trivial self-match) — exclude them from the left side
        not_self = ~is_bench_ids(ids[pair_doc])
        pair_doc, pair_bench = pair_doc[not_self], pair_bench[not_self]
        if len(pair_doc) == 0:
            return empty
        inter = _pair_intersection_counts(
            sh, offs, pair_doc, bsh, boffs, pair_bench
        )
        la = offs[pair_doc + 1] - offs[pair_doc]
        lb = boffs[pair_bench + 1] - boffs[pair_bench]
        # j >= 1/2  ⇔  inter / (la + lb - inter) >= 1/2  ⇔  3*inter >= la+lb
        keep = (inter > 0) & (3 * inter >= la + lb)
        pair_doc, pair_bench = pair_doc[keep], pair_bench[keep]
        inter, la, lb = inter[keep], la[keep], lb[keep]
        union = la + lb - inter
        return pa.table(
            {"doc_id": pa.array(ids[pair_doc], pa.int64()),
             "bench_doc_id": pa.array(bids[pair_bench], pa.int64()),
             "jaccard": pa.array(
                 np.round(inter / union, 6), pa.float64()
             )}
        )

    df = (
        _docs(sf_dir)
        .map_batches(score, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()  # contaminated pairs only — contamination-bounded
    )
    if len(df) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "bench_doc_id": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    df = df.sort_values(["doc_id", "bench_doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "bench_doc_id", "jaccard"]], preserve_index=False
    )


# SQL-gatable DESPITE the LSH: at threshold 0.5 with 32 bands x 2 rows the
# per-pair miss probability is (1 - j^2)^32 <= 1e-4 at the j=0.5 boundary
# and ~1e-12 at the planted j>=0.85, so exact-Jaccard IS the oracle (unlike
# dedup's 8x8 banding at 0.8, whose ~23%-at-threshold recall curve is the
# documented reason corpus_clean_keep/training_chunks stay rows-only).
# The gram CTE is the SHARED _word_gram_cte (short non-empty docs emit ONE
# gram over all their words — the batch_shingles convention; the parity
# fuzz caught a first draft that dropped sub-k docs and therefore missed
# 1-word exact copies the Ray side correctly pairs at jaccard 1.0); the
# jaccard >= 0.5 test is pure integers (3*inter >= |a|+|b|) on both sides.
def _fuzzy_decon_sql() -> str:
    from .dedup import SHINGLE_K

    return _word_gram_cte(SHINGLE_K) + f""",
b AS (SELECT doc_id, grams FROM g
      WHERE {bench_pred_sql()} AND len(grams) > 0),
tr AS (SELECT doc_id, grams FROM g
       WHERE NOT {bench_pred_sql()} AND len(grams) > 0),
p AS (
  SELECT tr.doc_id AS doc_id, b.doc_id AS bench_doc_id,
         len(list_intersect(tr.grams, b.grams)) AS inter,
         len(tr.grams) AS la, len(b.grams) AS lb
  FROM tr JOIN b ON TRUE)
SELECT doc_id, bench_doc_id,
       round(inter::DOUBLE / (la + lb - inter), 6) AS jaccard
FROM p WHERE inter > 0 AND 3 * inter >= la + lb
"""


register("text_decontaminate_fuzzy", q_decontaminate_fuzzy)
# Expected-miss budget for this gate (triage note: a future hash mismatch
# here is RECALL, not a code bug): the oracle is exact Jaccard >= 0.5 while
# the Ray side is MinHash-LSH banding, so the gate holds only while banding
# misses no >= 0.5 pair. Per-pair miss probability at the 0.5 boundary is
# <= 1e-4 (32 bands x 2 rows); the expected miss count is that times the
# number of boundary pairs, which scales with |corpus| x |benchmark|. With
# the DECON_BENCH_CAP bound (<= 10k bench docs) and gate scale sf0.01
# (~5k docs, a handful of >= 0.5 pairs), the budget is << 1e-2 misses; a
# regenerated driver corpus 100x larger could push it toward ~1, at which
# point the fix is an exact verify pass for candidate-free boundary pairs,
# not a rewrite.
register_lazy_sql("text_decontaminate_fuzzy", _fuzzy_decon_sql)
