"""Corpus cleaning: the composed training-data keep-set.

``corpus_clean_keep`` = documents that (a) clear the quality threshold,
(b) are their exact-duplicate group's survivor (min doc_id), and (c) are
their near-dup cluster's survivor — the canonical "clean the crawl" recipe
composed entirely from this repo's operators.

Composition shape (the anti-join is a flag-union groupby): every component
emits tiny (doc_id, flag-indicator) rows — quality keeps, exact-dup drops,
near-dup drops — and membership is decided by per-batch indicator partials
folded through one Arrow-native ``groupby(doc_id).max`` plus a vectorized
filter (NO per-doc Python; the tiny-group map_groups antipattern is
measured at minutes per 100k groups elsewhere in this repo). Only flags
cross the exchange, never documents. Exact-dup drops come from the
two-phase (hash -> min,count) aggregate with the DUPLICATED groups (a far
smaller set than the corpus; degenerate all-duplicate corpora bound it at
docs/2, noted) broadcast for a vectorized membership check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# module (not name) imports: corpus can be imported while dedup/textstats
# are still initializing (entry_queries registers every module, so a worker
# unpickling a dedup function re-enters this module mid-import of dedup);
# attribute access at CALL time always sees the finished modules
from . import dedup as _dedup
from . import textstats as _textstats
from .entry_queries import register, register_lazy_sql
from ..rayenv import remote_kwargs

FLAG_QUALITY = "q"       # document clears the quality gate
FLAG_EXACT_DROP = "x"    # exact duplicate of a lower doc_id
FLAG_NEAR_DROP = "n"     # near-dup cluster member that is not the survivor


def _quality_flags(sf_dir: str):
    def keep(batch: pa.Table) -> pa.Table:
        stats = _textstats.text_stats_batch(batch)
        import pyarrow.compute as pc

        kept = stats.filter(
            pc.greater_equal(stats.column("quality"), _textstats.QUALITY_THRESHOLD)
        )
        n = kept.num_rows
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "flag": pa.array([FLAG_QUALITY] * n, pa.string()),
            }
        )

    return _dedup._docs(sf_dir).map_batches(keep, batch_format="pyarrow", **remote_kwargs())


def _exact_drop_flags(sf_dir: str):
    """Non-survivors of each exact-duplicate group. Two-phase: an
    Arrow-native groupby(h1, h2) -> (min doc_id, count) aggregate over the
    128-bit content key, then ONLY the duplicated groups (count > 1) are
    broadcast (sorted by key) and each hashed batch checks membership
    vectorized (searchsorted range probe on the two sorted key columns) —
    no per-group Python, no second shuffle."""
    import ray
    from ray.data.aggregate import Count, Min

    hashed = _dedup._docs(sf_dir).map_batches(
        _dedup.exact_hash_batch, batch_format="pyarrow", **remote_kwargs()
    )
    groups = (
        hashed.groupby(["h1", "h2"]).aggregate(Min("doc_id"), Count()).to_pandas()
    )
    if len(groups) == 0:  # empty corpus
        dups = pd.DataFrame({"h1": [], "h2": [], "min(doc_id)": []})
    else:
        dups = groups[groups["count()"] > 1]
    dh1 = dups["h1"].to_numpy().astype(np.int64)
    dh2 = dups["h2"].to_numpy().astype(np.int64)
    keeps = dups["min(doc_id)"].to_numpy().astype(np.int64)
    order = np.lexsort((dh2, dh1))
    dup_ref = ray.put((dh1[order], dh2[order], keeps[order]))

    def drops(batch: pa.Table) -> pa.Table:
        dh1, dh2, keeps = ray.get(dup_ref)
        if len(dh1) == 0:  # no duplicated text anywhere
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "flag": pa.array([], pa.string())}
            )
        h1 = batch.column("h1").to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(dh1, h1, side="left")
        hi = np.searchsorted(dh1, h1, side="right")
        hit = np.zeros(len(ids), dtype=bool)
        keep_of = np.zeros(len(ids), dtype=np.int64)
        one = hi - lo == 1  # the overwhelmingly common case: unique h1
        li = lo[one]
        m = dh2[li] == h2[one]
        sub = np.flatnonzero(one)[m]
        hit[sub] = True
        keep_of[sub] = keeps[li[m]]
        for i in np.flatnonzero(hi - lo > 1):  # h1 collision: rare, tiny range
            rng = np.arange(lo[i], hi[i])
            eq = rng[dh2[rng] == h2[i]]
            if len(eq):
                hit[i] = True
                keep_of[i] = keeps[eq[0]]
        drop = hit & (ids != keep_of)
        return pa.table(
            {
                "doc_id": pa.array(ids[drop], pa.int64()),
                "flag": pa.array([FLAG_EXACT_DROP] * int(drop.sum()), pa.string()),
            }
        )

    return hashed.map_batches(drops, batch_format="pyarrow", **remote_kwargs())


#: hash-bucket count for the clean-keep-set's partitioned write — low
#: cardinality for directory fan-out, dense-id balanced via modulo
CLEAN_KEEP_SHARDS = 64


def clean_keep_ds(sf_dir: str):
    """LIBRARY form of the cleaning keep-set: a streaming Dataset of kept
    doc_ids. Every stage stays distributed (flag-union groupby, vectorized
    filter); nothing per-doc lands on the driver. q_corpus_clean_keep is
    only the driver-gate adapter on top of this."""
    import ray.data

    near = _dedup.q_minhash_dedup_keep(sf_dir)  # small: only docs in near-dup pairs
    near_drops = near.filter(
        pa.compute.equal(near.column("keep"), False)
    ).select(["doc_id"])
    near_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": near_drops.column("doc_id"),
                "flag": pa.array(
                    [FLAG_NEAR_DROP] * near_drops.num_rows, pa.string()
                ),
            }
        )
    )
    flags = _quality_flags(sf_dir).union(_exact_drop_flags(sf_dir)).union(near_ds)

    def pivot(batch: pa.Table) -> pa.Table:
        """Per-batch partial: one row per doc with indicator columns."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        fl = np.asarray(batch.column("flag").to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        ids, fl = ids[order], fl[order]
        uniq, first = np.unique(ids, return_index=True)
        cols = {}
        for name, flag in (("q", FLAG_QUALITY), ("x", FLAG_EXACT_DROP),
                           ("n", FLAG_NEAR_DROP)):
            ind = (fl == flag).astype(np.int8)
            # segment max per doc run — reduceat, not a per-doc comprehension
            cols[name] = (
                np.maximum.reduceat(ind, first) if len(uniq)
                else np.zeros(0, np.int8)
            )
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "q": pa.array(cols["q"], pa.int8()),
                "x": pa.array(cols["x"], pa.int8()),
                "n": pa.array(cols["n"], pa.int8()),
            }
        )

    folded = (
        flags.map_batches(pivot, batch_format="pyarrow", **remote_kwargs())
        .groupby("doc_id")
        .max(["q", "x", "n"])
    )

    def keep_filter(t: pa.Table) -> pa.Table:
        q = t.column("max(q)").to_numpy(zero_copy_only=False)
        x = t.column("max(x)").to_numpy(zero_copy_only=False)
        nn = t.column("max(n)").to_numpy(zero_copy_only=False)
        mask = (q == 1) & (x == 0) & (nn == 0)
        return pa.table(
            {
                "doc_id": pa.array(
                    t.column("doc_id").to_numpy(zero_copy_only=False)[mask],
                    pa.int64(),
                )
            }
        )

    return folded.map_batches(keep_filter, batch_format="pyarrow", **remote_kwargs())


def write_clean_keep(sf_dir: str, out_dir: str) -> None:
    """Write the cleaning keep-set as hash-sharded parquet (one directory
    per doc_id % CLEAN_KEEP_SHARDS bucket) — the 100-TB output contract:
    resumable per shard, no driver materialization, and downstream
    admission filters can pushdown-read only the shards they touch."""

    def shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array(ids % CLEAN_KEEP_SHARDS, pa.int64())
        )

    clean_keep_ds(sf_dir).map_batches(
        shard, batch_format="pyarrow", **remote_kwargs()
    ).write_parquet(out_dir, partition_cols=["shard"])


def q_corpus_clean_keep(sf_dir: str):
    """Gate adapter: kept doc_ids, sorted. SQL-gated since round 5: every
    component now has an exact DuckDB mirror — the near-dup drop set runs
    the SAME MinHash bands in SQL (dedup._minhash_cc_ctes, integer-exact
    via sqlhash), so banding recall is identical by construction, not
    approximated. Library path: clean_keep_ds / write_clean_keep."""
    df = clean_keep_ds(sf_dir).to_pandas()
    if len(df) == 0:  # empty corpus (or nothing survives the gates)
        return pa.table({"doc_id": pa.array([], pa.int64())})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _clean_keep_ctes() -> str:
    """CTE chain ending at ``ckeep(doc_id)`` = quality ∧ exact-dup survivor
    ∧ near-dup survivor, mirroring clean_keep_ds component-for-component:
    the MinHash-CC core (same bands both engines), exact-dup drops grouped
    by raw text (the (h1, h2) content hash is collision-free by contract —
    the same equivalence dedup_exact's green gate already rests on), and
    the text_stats quality predicate. Callers must open WITH RECURSIVE."""
    return f"""{_dedup._minhash_cc_ctes()},
ndrop AS (SELECT n AS doc_id FROM r GROUP BY n HAVING n <> min(l)),
xdrop AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY coalesce(text, '')) AS keep_id
    FROM documents) t
  WHERE doc_id <> keep_id),
ckeep AS (
  SELECT doc_id FROM ({_textstats._TEXT_STATS_SQL}) s
  WHERE s.quality >= {_textstats.QUALITY_THRESHOLD}
    AND doc_id NOT IN (SELECT doc_id FROM ndrop)
    AND doc_id NOT IN (SELECT doc_id FROM xdrop))"""


def _clean_keep_sql() -> str:
    return ("WITH RECURSIVE\n" + _clean_keep_ctes()
            + "\nSELECT doc_id FROM ckeep ORDER BY doc_id")


# ---------------------------------------------------------------------------
# source mixture planning — the data-mixing step of a training pipeline:
# per-source document/token totals plus the deterministic keep-rate that
# equalizes token budgets across sources (rate = min_source_tokens /
# source_tokens). Pure two-phase aggregate: per-batch (source, docs,
# tokens) partials -> one tiny groupby — only |sources| x |blocks| rows
# ever shuffle. Fully SQL-mirrorable (integer counts; rate rounded 6dp).
# ---------------------------------------------------------------------------

def _source_partials(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    src = batch.column("source").to_numpy(zero_copy_only=False)
    # NULL source groups like SQL's NULL group row; Ray's sort-based
    # aggregate cannot partition None keys, so it travels as the NUL
    # sentinel (same trick as eventops' props stats) and is restored in
    # q_source_mixture's finish
    src = np.where(pd.isna(src), _SET_SEP, src.astype(object))
    # shared null-safe ws_tokens convention (textstats.ws_token_counts)
    toks = _textstats.ws_token_counts(batch.column("text"))
    order = np.argsort(src, kind="stable")
    s, t = src[order], toks[order]
    uniq, first = np.unique(s, return_index=True)
    return pa.table(
        {
            "source": pa.array(uniq, pa.string()),
            "docs": pa.array(
                np.diff(np.append(first, len(s))).astype(np.int64), pa.int64()
            ),
            "tokens": pa.array(np.add.reduceat(t, first), pa.int64())
            if len(uniq)
            else pa.array([], pa.int64()),
        }
    )


def q_source_mixture(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _dedup._docs(sf_dir, columns=("doc_id", "text", "source")).map_batches(
        _source_partials, batch_format="pyarrow", **remote_kwargs()
    )
    df = (
        ds.groupby("source").aggregate(Sum("docs"), Sum("tokens")).to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64()),
             "keep_rate": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"sum(docs)": "n_docs", "sum(tokens)": "n_tokens"})
    # restore the NULL source group the NUL sentinel carried (see partial)
    df["source"] = df["source"].replace({_SET_SEP: None})
    # budget floor over POSITIVE-token groups; a zero-token group (e.g.
    # all-NULL-text source) has nothing to keep -> rate 0.0, and must not
    # drag the floor to 0 for everyone (SQL mirror pins the same rule)
    pos = df["n_tokens"] > 0
    lo = int(df.loc[pos, "n_tokens"].min()) if pos.any() else 0
    df["keep_rate"] = np.where(
        pos, np.round(lo / df["n_tokens"].where(pos, 1), 6), 0.0
    )
    df = df.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["source", "n_docs", "n_tokens", "keep_rate"]], preserve_index=False
    )


_SOURCE_MIX_SQL = """
WITH s AS (
  SELECT source, count(*) AS n_docs,
         CAST(coalesce(sum(coalesce(
                (length(text) - length(replace(text, ' ', ''))) + 1, 0)), 0)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1)
SELECT source, n_docs, n_tokens,
       CASE WHEN n_tokens > 0 THEN
         round((SELECT min(n_tokens) FROM s WHERE n_tokens > 0)
               / CAST(n_tokens AS DOUBLE), 6)
       ELSE 0.0 END AS keep_rate
FROM s ORDER BY source
"""


# ---------------------------------------------------------------------------
# temperature-scaled source mixture (alpha-sampling): w_i ∝ share_i^alpha,
# the standard multilingual/data-mixing rule (alpha<1 upsamples small
# sources). Same per-block (source, tokens) combiner as source_mixture —
# the only exchange carries one row per source per block; the weight math
# runs on the driver over the tiny per-source table (fine at any corpus
# size: |sources| is thousands, not rows).
# ---------------------------------------------------------------------------

TEMPERATURE_ALPHA = 0.3  # classic multilingual-sampling temperature


def q_temperature_mixture(sf_dir: str):
    """Per-source temperature-scaled sampling weights: share = token share,
    weight ∝ share^alpha (normalized), boost = weight/share (the effective
    up/down-sampling factor). Zero-token sources have no mass to sample and
    are excluded (mirrored in the SQL)."""
    from ray.data.aggregate import Sum

    ds = _dedup._docs(sf_dir, columns=("doc_id", "text", "source")).map_batches(
        _source_partials, batch_format="pyarrow", **remote_kwargs()
    )
    df = ds.groupby("source").aggregate(Sum("tokens")).to_pandas()
    if len(df) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64()),
             "share": pa.array([], pa.float64()),
             "weight": pa.array([], pa.float64()),
             "boost": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"sum(tokens)": "n_tokens"})
    df["source"] = df["source"].replace({_SET_SEP: None})
    df = df[df["n_tokens"] > 0].reset_index(drop=True)
    share = df["n_tokens"] / float(df["n_tokens"].sum())
    w = share ** TEMPERATURE_ALPHA
    weight = w / w.sum()
    df["share"] = share.round(6)
    df["weight"] = weight.round(6)
    df["boost"] = (weight / share).round(6)
    df = df.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["source", "n_tokens", "share", "weight", "boost"]],
        preserve_index=False,
    )


_TEMPERATURE_MIX_SQL = f"""
WITH s AS (
  SELECT source,
         CAST(coalesce(sum(coalesce(
                (length(text) - length(replace(text, ' ', ''))) + 1, 0)), 0)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
t AS (
  SELECT source, n_tokens,
         n_tokens / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM s
                     WHERE n_tokens > 0) AS share
  FROM s WHERE n_tokens > 0),
u AS (
  SELECT source, n_tokens, share,
         pow(share, {TEMPERATURE_ALPHA}) AS w
  FROM t)
SELECT source, n_tokens, round(share, 6) AS share,
       round(w / (SELECT sum(w) FROM u), 6) AS weight,
       round((w / (SELECT sum(w) FROM u)) / share, 6) AS boost
FROM u ORDER BY source
"""


# ---------------------------------------------------------------------------
# the capstone composition: cleaned corpus -> training chunks. The keep-set
# (quality ∧ exact-dup survivor ∧ near-dup survivor) is broadcast once as a
# sorted id array; the chunking pass filters each batch vectorized
# (searchsorted membership) BEFORE windowing, so dropped documents never
# reach the chunker. Output = the actual unit a tokenizer consumes.
# ---------------------------------------------------------------------------

def q_training_chunks(sf_dir: str):
    """(doc_id, chunk_idx, n_tokens) for every chunk of every KEPT document.

    SQL-gated since round 5: the keep-set's near-dup component is
    MinHash-LSH with 8 bands x 8 rows (detection probability ~ 0.77 at the
    0.8 Jaccard threshold), so an exact-Jaccard mirror would be the WRONG
    oracle — but the round-5 sqlhash machinery mirrors the SAME bands
    integer-exactly in DuckDB (dedup._minhash_cc_ctes), making banding
    recall identical by construction and the composed gate exact."""
    import ray

    from . import textstats as _textstats2

    keep = q_corpus_clean_keep(sf_dir)
    keep_ids = np.sort(
        keep.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    keep_ref = ray.put(keep_ids)

    def chunk_kept(batch: pa.Table) -> pa.Table:
        kept = ray.get(keep_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(kept):
            pos = np.searchsorted(kept, ids)
            pos[pos == len(kept)] = 0
            mask = kept[pos] == ids
        else:
            mask = np.zeros(len(ids), dtype=bool)
        if not mask.all():
            batch = batch.filter(pa.array(mask))
        out = _textstats2.chunk_documents_batch(batch)
        return out.select(["doc_id", "chunk_idx", "n_tokens"])

    return _dedup._docs(sf_dir).map_batches(
        chunk_kept, batch_format="pyarrow", **remote_kwargs()
    )


# ---------------------------------------------------------------------------
# corpus report — the one-pass dashboard summary: every statistic is an
# integer partial (counts, sums, per-batch distinct sets for the tiny
# lang/source vocabularies) folded once, so a 100-TB corpus costs one
# column-pruned scan and one tiny driver fold; means derive from the exact
# integer pairs AFTER the fold.
# ---------------------------------------------------------------------------

#: fan-in delimiter for the per-batch distinct lang/source sets — NUL, the
#: same reserved byte eventops' NULL-group sentinel uses, so a value
#: containing ',' can't split into two (NULL values are excluded outright,
#: matching SQL's count(DISTINCT))
_SET_SEP = "\x00"


def _report_partial(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    null = pc.is_null(text).to_numpy(zero_copy_only=False).astype(bool)
    # NULL text contributes nothing (SQL's sum() skips the row) and is not
    # "empty"; ws_token_counts is the shared null-safe convention
    toks = _textstats.ws_token_counts(text)
    ln = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    chars = np.where(
        null, 0.0, np.nan_to_num(ln.astype(np.float64))
    ).astype(np.int64)
    empty = int(((chars == 0) & ~null).sum())

    def distinct(col):
        # '' is a legitimate DISTINCT value (SQL counts it); only NULL is
        # excluded. An empty set fans in as NULL so "" can't be conjured
        # from the join of nothing.
        vals = sorted(
            str(x)
            for x in pc.unique(batch.column(col)).to_pylist()
            if x is not None
        )
        return _SET_SEP.join(vals) if vals else None

    return pa.table(
        {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_tokens": pa.array([int(toks.sum())], pa.int64()),
            "n_chars": pa.array([int(chars.sum())], pa.int64()),
            "n_empty": pa.array([empty], pa.int64()),
            "langs": pa.array([distinct("lang")], pa.string()),
            "sources": pa.array([distinct("source")], pa.string()),
        }
    )


def q_corpus_report(sf_dir: str):
    """One summary row: doc/token/char totals, empty-doc count, distinct
    lang and source counts, mean tokens/chars per doc (6dp, derived from
    exact integer totals)."""
    df = (
        _dedup._docs(sf_dir, columns=("text", "lang", "source"))
        .map_batches(_report_partial, batch_format="pyarrow",
                     **remote_kwargs())
        .to_pandas()
    )
    if len(df) == 0 or "n_docs" not in df.columns:
        n_docs = n_tokens = n_chars = n_empty = 0
        langs, sources = set(), set()
    else:
        n_docs = int(df["n_docs"].sum())
        n_tokens = int(df["n_tokens"].sum())
        n_chars = int(df["n_chars"].sum())
        n_empty = int(df["n_empty"].sum())
        langs = set()
        sources = set()
        for v in df["langs"]:
            if v is not None:
                langs.update(v.split(_SET_SEP))
        for v in df["sources"]:
            if v is not None:
                sources.update(v.split(_SET_SEP))
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "n_chars": pa.array([n_chars], pa.int64()),
            "n_empty": pa.array([n_empty], pa.int64()),
            "n_langs": pa.array([len(langs)], pa.int64()),
            "n_sources": pa.array([len(sources)], pa.int64()),
            "mean_tokens": pa.array(
                [round(n_tokens / max(n_docs, 1), 6)], pa.float64()
            ),
            "mean_chars": pa.array(
                [round(n_chars / max(n_docs, 1), 6)], pa.float64()
            ),
        }
    )


_REPORT_SQL = """
SELECT count(*) AS n_docs,
       CAST(coalesce(sum((length(text) - length(replace(text, ' ', '')))
                         + 1), 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS n_chars,
       CAST(coalesce(sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_empty,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       round(CAST(coalesce(sum((length(text) - length(replace(text, ' ', '')))
                               + 1), 0) AS BIGINT)
             / CAST(greatest(count(*), 1) AS DOUBLE), 6) AS mean_tokens,
       round(CAST(coalesce(sum(length(text)), 0) AS BIGINT)
             / CAST(greatest(count(*), 1) AS DOUBLE), 6) AS mean_chars
FROM documents
"""


#: hash partitions for the chunks semi-join (scale knob: ~cluster cores)
CHUNK_JOIN_PARTITIONS = 8


def training_chunks_ds(sf_dir: str, *, with_text: bool = False):
    """LIBRARY form of the training-chunk extraction: documents
    ``left_semi``-joined against the STREAMING keep-set dataset, then
    chunked — no driver keep-table and no ray.put broadcast anywhere, so
    the shape survives a keep-set of 10^12 ids (the gate adapter
    q_training_chunks broadcasts instead because at gate SF one ray.put
    beats a hash shuffle; both paths are pinned equal in pytest).

    Sentinel mechanics (the relational ops' pattern, relutil.py): Ray
    2.49's hash join crashes on partitions that receive no rows, so one
    impossible (negative) doc_id per partition is planted on BOTH sides —
    the semi join keeps them, and their empty text yields zero chunks, so
    they vanish without a filter pass; a defensive >= 0 filter guards the
    with_text=False projection anyway."""
    import ray.data

    from .relutil import _q3_join_sentinels

    sent = _q3_join_sentinels(CHUNK_JOIN_PARTITIONS)
    docs = _dedup._docs(sf_dir).union(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(sent, pa.int64()),
         "text": pa.array([""] * len(sent), pa.string())}
    )))
    keep = clean_keep_ds(sf_dir).union(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(sent, pa.int64())}
    )))
    kept = docs.join(
        keep, join_type="left_semi",
        num_partitions=CHUNK_JOIN_PARTITIONS, on=("doc_id",),
    )
    cols = ["doc_id", "chunk_idx", "n_tokens"] + (
        ["chunk_text"] if with_text else []
    )

    def chunk(batch: pa.Table) -> pa.Table:
        out = _textstats.chunk_documents_batch(batch)
        ids = out.column("doc_id").to_numpy(zero_copy_only=False)
        return out.filter(pa.array(ids >= 0)).select(cols)

    return kept.map_batches(chunk, batch_format="pyarrow", **remote_kwargs())


def write_training_chunks(sf_dir: str, out_dir: str) -> None:
    """Write the cleaned corpus's training chunks (WITH chunk_text — the
    actual tokenizer input) as hash-sharded parquet, same resumable layout
    contract as write_clean_keep."""

    def shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array(ids % CLEAN_KEEP_SHARDS, pa.int64())
        )

    training_chunks_ds(sf_dir, with_text=True).map_batches(
        shard, batch_format="pyarrow", **remote_kwargs()
    ).write_parquet(out_dir, partition_cols=["shard"])


def _training_chunks_sql() -> str:
    """Exact mirror of q_training_chunks: the clean-keep CTE filters the
    chunking mirror (text_chunking's gate-green _CHUNK_SQL, nested as a
    subquery) down to kept documents."""
    return f"""WITH RECURSIVE
{_clean_keep_ctes()}
SELECT ch.doc_id, ch.chunk_idx, ch.n_tokens
FROM ({_textstats._CHUNK_SQL}) ch
WHERE ch.doc_id IN (SELECT doc_id FROM ckeep)
"""


# SQL-gated since round 5 (see q_corpus_clean_keep / q_training_chunks
# docstrings: the mirror runs the SAME MinHash bands via sqlhash). Lazy:
# the SQL composes dedup/textstats fragments, and building it at import
# time would touch partially-initialized sibling modules on workers (the
# circular-import contract at the top of this file).
register("corpus_clean_keep", q_corpus_clean_keep)
register_lazy_sql("corpus_clean_keep", _clean_keep_sql)
register("corpus_training_chunks", q_training_chunks)
register_lazy_sql("corpus_training_chunks", _training_chunks_sql)
register("corpus_source_mixture", q_source_mixture, _SOURCE_MIX_SQL)
register("corpus_temperature_mixture", q_temperature_mixture,
         _TEMPERATURE_MIX_SQL)
register("corpus_report", q_corpus_report, _REPORT_SQL)


# ---------------------------------------------------------------------------
# sequence packing — the GPT-style "concatenate the corpus in doc_id order,
# then cut fixed-length training sequences" assignment: every doc gets the
# pack (sequence) index and intra-pack offset where its tokens start. The
# global prefix sum is computed in two phases so no stage ever sees the
# whole corpus: (1) docs hash into contiguous doc_id BUCKETS; per-bucket
# token totals (a tiny |buckets| table) come from a per-block combiner +
# groupby, and the exclusive cumsum over buckets happens on the driver
# (O(corpus/PACK_BUCKET) rows — ~1.5M at 10^11 docs); (2) each bucket's
# rows co-locate via ONE groupby and a vectorized in-group cumsum adds the
# broadcast bucket base. A bucket (PACK_BUCKET docs x 24 B) is the unit
# that must fit a block — the same bounded-group contract as the kNN IVF
# cells, and orders of magnitude below block limits.

PACK_SEQ_LEN = 2048
PACK_BUCKET = 65_536  # docs per prefix bucket


def _pack_token_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, bucket) — one row per doc; the only columns the
    packing pipeline ever shuffles (text stays in the scan stage)."""
    flat, parents = _textstats._words_flat(batch)
    n = batch.num_rows
    n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
    doc_id = (
        batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "bucket": pa.array(doc_id // PACK_BUCKET, pa.int64()),
        }
    )


def _pack_bucket_partials(batch: pa.Table) -> pa.Table:
    b = batch.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
    t = (
        batch.column("n_tokens").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(b) == 0:
        return pa.table(
            {"bucket": pa.array([], pa.int64()),
             "s": pa.array([], pa.int64())}
        )
    order = np.argsort(b, kind="stable")
    b_s = b[order]
    first = np.flatnonzero(np.concatenate([[True], b_s[1:] != b_s[:-1]]))
    return pa.table(
        {
            "bucket": pa.array(b_s[first], pa.int64()),
            "s": pa.array(np.add.reduceat(t[order], first), pa.int64()),
        }
    )


def q_pack_sequences(sf_dir: str):
    """(doc_id, n_tokens, pack_id, pack_offset): pack_id = which SEQ_LEN
    training sequence this doc's tokens start in when the corpus is
    concatenated in doc_id order; pack_offset = position inside it."""
    import ray
    from ray.data.aggregate import Sum

    tok = (
        _dedup._docs(sf_dir)
        .map_batches(_pack_token_rows, batch_format="pyarrow",
                     **remote_kwargs())
        .materialize()  # 24 B/doc; re-read by both phases
    )
    bsum = (
        tok.map_batches(_pack_bucket_partials, batch_format="pyarrow",
                        **remote_kwargs())
        .groupby("bucket").aggregate(Sum("s"))
        .to_pandas()  # O(|buckets|)
    )
    if len(bsum) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64()),
             "pack_id": pa.array([], pa.int64()),
             "pack_offset": pa.array([], pa.int64())}
        )
    bsum = bsum.sort_values("bucket").reset_index(drop=True)
    buckets = bsum["bucket"].to_numpy(np.int64)
    totals = bsum["sum(s)"].to_numpy(np.int64)
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])  # exclusive
    base_ref = ray.put((buckets, bases))

    def _fold(group: pa.Table) -> pa.Table:
        bks, bss = ray.get(base_ref)
        d = (
            group.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        t = (
            group.column("n_tokens").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(d, kind="stable")
        d_s, t_s = d[order], t[order]
        cum_before = np.concatenate([[0], np.cumsum(t_s)[:-1]])
        base = bss[np.searchsorted(bks, d_s[0] // PACK_BUCKET)]
        pos = base + cum_before
        return pa.table(
            {
                "doc_id": pa.array(d_s, pa.int64()),
                "n_tokens": pa.array(t_s, pa.int64()),
                "pack_id": pa.array(pos // PACK_SEQ_LEN, pa.int64()),
                "pack_offset": pa.array(pos % PACK_SEQ_LEN, pa.int64()),
            }
        )

    return tok.groupby("bucket").map_groups(
        _fold, batch_format="pyarrow", **remote_kwargs()
    )


_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(coalesce(text, ''), '[ \\t\\n\\r\\x0b\\x0c]+'),
                         x -> x != '')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cb
  FROM t)
SELECT doc_id, n_tokens,
       CAST(cb AS BIGINT) // {PACK_SEQ_LEN} AS pack_id,
       CAST(cb AS BIGINT) % {PACK_SEQ_LEN} AS pack_offset
FROM c ORDER BY doc_id
"""

register("corpus_pack_sequences", q_pack_sequences, _PACK_SQL)


# ---------------------------------------------------------------------------
# token-budget corpus selection — the "fill the training budget with the
# best documents" shape: keep the highest-quality docs until their tokens
# reach a budget (here half the corpus's BPE tokens, so the query is
# self-scaling and deterministic at any sf). Boundary rule: the threshold
# is the LOWEST quality level whose descending cumulative tokens reach the
# budget, and the entire tie class at that level is kept — the overshoot
# is bounded by one quality value's mass, and the rule needs no per-doc
# rank (no global sort).
#
# Scale shape: quality is the 6-dp contract (=> <= 1e6+1 distinct micro
# cells no matter the corpus size), so pass 1 folds the (quality_micro ->
# token mass) DISTRIBUTION via groupby(v).Sum — bounded rows — and one
# tiny selection finds the threshold; pass 2 is an embarrassingly
# parallel keep/drop compare. Same two-pass contract as
# text_perplexity_buckets / quantiles.py.
# ---------------------------------------------------------------------------

#: budget = corpus_bpe_tokens // TOKEN_BUDGET_DIV (integer, exact)
TOKEN_BUDGET_DIV = 2


def q_token_budget(sf_dir: str):
    """(doc_id, bpe_tokens, quality, kept) for every document: kept=True
    iff the doc's quality clears the budget threshold (whole boundary tie
    class inclusive). NULL text counts as '' (0 tokens) on BOTH engines —
    the repo-wide NULL≡'' convention text_stats_batch and its mirror now
    share, replacing this op's earlier drop-NULL-rows contract."""
    from .quantiles import QUANTILE_MAX_GROUP, _distribution_fold

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "bpe_tokens": pa.array([], pa.int64()),
         "quality": pa.array([], pa.float64()),
         "kept": pa.array([], pa.bool_())}
    )

    def stats():
        # text_stats_batch fills NULL text to '' itself (NULL≡'')
        return _dedup._docs(sf_dir).map_batches(
            _textstats.text_stats_batch, batch_format="pyarrow",
            **remote_kwargs()
        )

    def dist_partial(batch: pa.Table) -> pa.Table:
        q = (
            batch.column("quality")
            .to_numpy(zero_copy_only=False).astype(np.float64)
        )
        qm = np.rint(q * 1e6).astype(np.int64)  # exact: q is 6-dp rounded
        tok = (
            batch.column("bpe_tokens")
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        uniq, inv = np.unique(qm, return_inverse=True)
        # cnt = the quality level's token MASS, not its row count — the
        # shared fold only needs an int64 weight per (key, v)
        return pa.table(
            {"k": pa.array(["g"] * len(uniq), pa.string()),
             "v": pa.array(uniq, pa.int64()),
             "cnt": pa.array(np.bincount(inv, weights=tok).astype(np.int64),
                             pa.int64())}
        )

    def select_threshold(group: pa.Table) -> pa.Table:
        if group.num_rows > QUANTILE_MAX_GROUP:
            raise ValueError(
                "quality distribution exceeds QUANTILE_MAX_GROUP — the "
                "6-dp quality grid is bounded at 1e6+1 cells, so this "
                "indicates a contract violation upstream"
            )
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        tok = (
            group.column("cnt")
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.argsort(-v, kind="stable")  # quality descending
        v, tok = v[order], tok[order]
        cum = np.cumsum(tok)
        budget = int(cum[-1]) // TOKEN_BUDGET_DIV
        t = int(v[np.searchsorted(cum, budget, side="left")])
        return pa.table({"t": pa.array([t], pa.int64())})

    th = _distribution_fold(
        stats(), dist_partial, "k", select_threshold
    ).to_pandas()
    if len(th) == 0:
        return empty
    t = int(th["t"][0])

    def verdict(batch: pa.Table) -> pa.Table:
        q = (
            batch.column("quality")
            .to_numpy(zero_copy_only=False).astype(np.float64)
        )
        qm = np.rint(q * 1e6).astype(np.int64)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "bpe_tokens": batch.column("bpe_tokens"),
             "quality": batch.column("quality"),
             "kept": pa.array(qm >= t, pa.bool_())}
        )

    return stats().map_batches(
        verdict, batch_format="pyarrow", **remote_kwargs()
    )


register("corpus_token_budget", q_token_budget)


def _token_budget_sql() -> str:
    """Deferred (see entry_queries.LAZY_ORACLE_SQL): composes the
    _TEXT_STATS_SQL contract, which is not yet defined when a worker-side
    direct import of textstats re-enters this module."""
    from .textstats import _TEXT_STATS_SQL

    # threshold mirror: descending cumulative token mass over the
    # quality_micro distribution; the threshold is max(qm) among rows
    # whose cum reaches the budget (= the first row, in descending
    # quality order, where the running total crosses it).
    # Window sum(tok) OVER (ORDER BY qm DESC) and numpy's descending
    # cumsum select the identical level; integer token sums make the
    # comparison exact.
    token_budget_sql = f"""
WITH q AS ({_TEXT_STATS_SQL}),
s AS (SELECT doc_id, bpe_tokens, quality,
             CAST(round(quality * 1000000) AS BIGINT) AS qm FROM q),
d AS (SELECT qm, sum(bpe_tokens) AS tok FROM s GROUP BY 1),
c AS (SELECT qm, sum(tok) OVER (ORDER BY qm DESC) AS cum FROM d),
tot AS (SELECT sum(bpe_tokens) // {TOKEN_BUDGET_DIV} AS budget FROM s),
th AS (SELECT max(qm) AS t FROM c WHERE cum >= (SELECT budget FROM tot))
SELECT s.doc_id, s.bpe_tokens, s.quality, (s.qm >= th.t) AS kept
FROM s, th
"""
    return token_budget_sql


register_lazy_sql("corpus_token_budget", _token_budget_sql)


# ---------------------------------------------------------------------------
# deterministic training-epoch shuffle — every epoch loader needs a stable,
# seeded global permutation of the corpus. Key = md5(seed:doc_id) (md5 IS
# the mirrored contract with DuckDB's md5(), same deliberate trade as the
# textstats fingerprint — hashlib releases the GIL and runs C); global
# positions come from the pack_sequences two-phase shape: (1) per-block
# bucket histograms on the key's 12-bit prefix -> driver cumsum gives each
# bucket's exclusive base (O(SHUFFLE_BUCKETS) driver rows); (2) one
# groupby(bucket).map_groups sorts each bucket internally and enumerates
# from its base. A bucket is the unit of memory (corpus/SHUFFLE_BUCKETS
# rows x ~56 B) — scale SHUFFLE_BUCKETS with the corpus (~sqrt n) the same
# way IVF_CELLS scales.
# ---------------------------------------------------------------------------

SHUFFLE_BUCKETS = 4096  # 12-bit md5 prefix
SHUFFLE_SEED = "ep0"


def _shuffle_rows(batch: pa.Table) -> pa.Table:
    import hashlib

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    keys = [
        hashlib.md5(f"{SHUFFLE_SEED}:{int(i)}".encode()).hexdigest()
        for i in ids
    ]
    bucket = np.array([int(k[:3], 16) for k in keys], np.int64)
    return pa.table(
        {"bucket": pa.array(bucket, pa.int64()),
         "skey": pa.array(keys, pa.string()),
         "doc_id": pa.array(ids.astype(np.int64), pa.int64())}
    )


def q_epoch_shuffle(sf_dir: str):
    """(doc_id, epoch_pos): the doc's position in the seeded global shuffle
    order — exact global row_number without a global sort."""
    import ray
    from ray.data.aggregate import Sum

    rows = (
        _dedup._docs(sf_dir, columns=("doc_id",))
        .map_batches(_shuffle_rows, batch_format="pyarrow",
                     **remote_kwargs())
        .materialize()  # ~56 B/doc; read by both phases
    )

    def _bucket_partials(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(u, pa.int64()),
             "s": pa.array(c.astype(np.int64), pa.int64())}
        )

    bsum = (
        rows.map_batches(_bucket_partials, batch_format="pyarrow",
                         **remote_kwargs())
        .groupby("bucket").aggregate(Sum("s"))
        .to_pandas()  # O(SHUFFLE_BUCKETS)
    )
    if len(bsum) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "epoch_pos": pa.array([], pa.int64())}
        )
    bsum = bsum.sort_values("bucket").reset_index(drop=True)
    buckets = bsum["bucket"].to_numpy(np.int64)
    bases = np.concatenate(
        [[0], np.cumsum(bsum["sum(s)"].to_numpy(np.int64))[:-1]]
    )
    base_ref = ray.put((buckets, bases))

    def _fold(group: pa.Table) -> pa.Table:
        bks, bss = ray.get(base_ref)
        df = group.to_pandas().sort_values(
            ["skey", "doc_id"], kind="stable"
        )
        base = int(bss[np.searchsorted(bks, int(df["bucket"].iloc[0]))])
        return pa.table(
            {"doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
             "epoch_pos": pa.array(
                 base + np.arange(len(df), dtype=np.int64), pa.int64()
             )}
        )

    return rows.groupby("bucket").map_groups(_fold, batch_format="pyarrow")


_EPOCH_SHUFFLE_SQL = f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{SHUFFLE_SEED}:' || doc_id), doc_id) - 1 AS BIGINT)
         AS epoch_pos
FROM documents
"""

register("corpus_epoch_shuffle", q_epoch_shuffle, _EPOCH_SHUFFLE_SQL)


# ---------------------------------------------------------------------------
# train/holdout split report — the deterministic hash split every training
# pipeline runs before the tokenizer sees a byte: ~1% of docs (by a 16-bit
# md5(doc_id) prefix, the repo's mirrored sampling contract — see
# sample_stratified_batch's md5 note) are fenced off as held-out data, and
# the report shows the per-source counts so a skewed source can't silently
# dominate the holdout. Pure filter+count inside map_batches: each block
# collapses to its distinct (source, split) cells, ONE tiny groupby, no
# doc rows shuffle.
# ---------------------------------------------------------------------------

#: holdout iff substr(md5(doc_id), 1, 4) < HOLDOUT_HEX — 0x028f/0x10000 ≈ 1.0%
HOLDOUT_HEX = "028f"


def _holdout_partials(batch: pa.Table) -> pa.Table:
    import hashlib

    ids = batch.column("doc_id").to_pylist()
    # md5 retained DELIBERATELY: the split decision IS the hash value and
    # must be byte-reproducible by the mirror's substr(md5(...)) (same
    # contract as sample_stratified_batch)
    hold = np.array(
        [hashlib.md5(str(i).encode()).hexdigest()[:4] < HOLDOUT_HEX
         for i in ids],
        dtype=np.int64,
    )
    src = batch.column("source").to_numpy(zero_copy_only=False).astype(str)
    order = np.argsort(src, kind="stable")
    s = src[order]
    h = hold[order]
    first = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
    return pa.table(
        {
            "source": pa.array(s[first], pa.string()),
            "n_holdout": pa.array(np.add.reduceat(h, first), pa.int64()),
            "n_docs": pa.array(
                np.diff(np.append(first, len(s))).astype(np.int64), pa.int64()
            ),
        }
    )


def q_train_holdout_split(sf_dir: str):
    """(source, n_train, n_holdout, holdout_pct) — deterministic ~1% split."""
    from ray.data.aggregate import Sum

    df = (
        _dedup._docs(sf_dir, columns=("doc_id", "source"))
        .map_batches(_holdout_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("source")
        .aggregate(Sum("n_holdout", alias_name="n_holdout"),
                   Sum("n_docs", alias_name="n_docs"))
        .to_pandas()  # |sources| rows
    )
    if len(df) == 0 or "source" not in df.columns:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "n_train": pa.array([], pa.int64()),
             "n_holdout": pa.array([], pa.int64()),
             "holdout_pct": pa.array([], pa.float64())}
        )
    nh = df["n_holdout"].to_numpy().astype(np.int64)
    nd = df["n_docs"].to_numpy().astype(np.int64)
    out = pa.table(
        {
            "source": pa.array(df["source"].astype(str), pa.string()),
            "n_train": pa.array(nd - nh, pa.int64()),
            "n_holdout": pa.array(nh, pa.int64()),
            "holdout_pct": pa.array(
                np.round(nh / nd * 100.0, 6), pa.float64()
            ),
        }
    )
    return out.sort_by([("source", "ascending")])


_HOLDOUT_SQL = f"""
SELECT source,
       CAST(count(*) FILTER (
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) >= '{HOLDOUT_HEX}'
       ) AS BIGINT) AS n_train,
       CAST(count(*) FILTER (
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{HOLDOUT_HEX}'
       ) AS BIGINT) AS n_holdout,
       round(count(*) FILTER (
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{HOLDOUT_HEX}'
       ) * 100.0 / count(*), 6) AS holdout_pct
FROM documents GROUP BY 1 ORDER BY 1
"""

register("corpus_train_holdout_split", q_train_holdout_split, _HOLDOUT_SQL)


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
# arXiv:2302.03169): score every corpus document by how much its hashed
# bigram features look like a TARGET domain sample relative to the raw
# corpus. Target stand-in = the decontam benchmark set (doc_id % MOD == 0),
# the same "eval suite living in its own table" swap point.
#
# 100-TB shape: pass 1 is a histogram scan whose per-block partial is at
# most DSIR_DIM rows (no shuffle — the driver folds |blocks| x <=DSIR_DIM
# tiny rows); pass 2 is an ACTOR-POOL scoring scan (the importance-weight
# table is built once per actor in __init__ from the broadcast histograms,
# the model-load pattern) with zero exchange. Two corpus scans total —
# exactly the estimate-then-score structure of the paper.
#
# Parity contract: per-bucket log-ratio quantized to INTEGER micro-nats
# (round(1e6 * (ln p - ln q)), the text_lm_score contract) so the per-doc
# sum is exact int64 arithmetic in any order and engine; the feature hash
# is the mirrored md5-substr contract of text_classifier_scores.
# ---------------------------------------------------------------------------

DSIR_DIM = 1024  # hashed feature buckets (paper uses 10^4 for full CC)


def _bigram_flat(batch: pa.Table):
    """(bigrams:StringArray, parents:int64) — consecutive same-doc token
    pairs joined with one space (words never contain whitespace, so the
    join is unambiguous on both engines)."""
    import pyarrow.compute as pc

    flat, parents = _textstats._words_flat(batch)
    if len(flat) < 2:
        return flat.slice(0, 0), np.zeros(0, np.int64)
    same = parents[1:] == parents[:-1]
    m = pa.array(same)
    a = flat.slice(0, len(flat) - 1).filter(m)
    b = flat.slice(1).filter(m)
    return (
        pc.binary_join_element_wise(a, b, " "),
        parents[:-1][same],
    )


def _dsir_buckets(bigrams) -> np.ndarray:
    """md5-substr bucket per bigram, hashed once per DISTINCT bigram.

    md5 is retained DELIBERATELY as the cross-engine feature-hash contract
    (the mirror's substr(md5(bigram), 1, 12) — same rule as
    text_classifier_scores / fingerprint / stratified sample). The Python
    loop runs per distinct bigram per batch behind a dictionary_encode;
    measured envelope: 1M docs end-to-end in 7.9 s at 32 cpus (both DSIR
    passes included), so the hash is not the bottleneck at bench scale —
    swap in a vectorized splitmix on the word-hash pairs if a real corpus
    ever makes it one (at the cost of the SQL gate)."""
    import hashlib

    import pyarrow.compute as pc

    if len(bigrams) == 0:
        return np.zeros(0, np.int64)
    d = pc.dictionary_encode(bigrams)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = np.array(
        [
            int(hashlib.md5(s.encode()).hexdigest()[:12], 16) % DSIR_DIM
            for s in d.dictionary.to_pylist()
        ],
        dtype=np.int64,
    )
    return uniq[d.indices.to_numpy(zero_copy_only=False)]


def dsir_histograms(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(n_all, n_bench) int64[DSIR_DIM] bigram-bucket histograms over the
    corpus and the benchmark subset. Per-block partials are <= DSIR_DIM
    rows; the driver fold is O(blocks x DSIR_DIM)."""
    from .decontam import is_bench_ids

    def partial(batch: pa.Table) -> pa.Table:
        big, parents = _bigram_flat(batch)
        bk = _dsir_buckets(big)
        ids = (
            batch.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bench_rows = is_bench_ids(ids)[parents]
        n_all = np.bincount(bk, minlength=DSIR_DIM)
        n_bench = np.bincount(bk[bench_rows], minlength=DSIR_DIM)
        present = np.flatnonzero(n_all)
        return pa.table(
            {
                "bucket": pa.array(present, pa.int64()),
                "n_all": pa.array(n_all[present], pa.int64()),
                "n_bench": pa.array(n_bench[present], pa.int64()),
            }
        )

    df = (
        _dedup._docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    n_all = np.zeros(DSIR_DIM, np.int64)
    n_bench = np.zeros(DSIR_DIM, np.int64)
    if len(df):
        g = df.groupby("bucket").sum()
        n_all[g.index.to_numpy()] = g["n_all"].to_numpy()
        n_bench[g.index.to_numpy()] = g["n_bench"].to_numpy()
    return n_all, n_bench


class DsirScorer:
    """Actor-pool scoring stage: the per-bucket importance weight table
    (integer micro-nats) is derived once per actor in ``__init__`` from the
    corpus/target histograms; ``__call__`` is one gather + segment-sum."""

    def __init__(self, n_all: np.ndarray, n_bench: np.ndarray):
        s_all = float(n_all.sum())
        s_bench = float(n_bench.sum())
        # add-1 smoothed log-ratio, quantized BEFORE the per-doc sum (the
        # text_lm_score micro-nat contract: int64 sums are order-exact and
        # the 1e6 quantizer absorbs last-ulp ln() noise between engines).
        # Accepted tie risk (same as text_lm_score, but here the weight
        # feeds q_dsir_select's mean-threshold FILTER, so a 1-unit drift
        # could change a row set, not just a score column): np.rint is
        # round-half-to-even while the DuckDB mirror's round() is
        # half-away-from-zero — they differ only when the log-ratio lands
        # EXACTLY on x.5 micro-nats, which requires ln(p)-ln(q) to be an
        # exact odd multiple of 5e-7 in binary64; no such value has been
        # observed across the parity-fuzz corpora. If this gate ever
        # flakes, switch both sides to an exact rational compare
        # (numerator/denominator int pairs) instead of widening the
        # quantizer.
        p = (n_bench + 1) / (s_bench + DSIR_DIM)
        q = (n_all + 1) / (s_all + DSIR_DIM)
        self.m = np.rint((np.log(p) - np.log(q)) * 1e6).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        big, parents = _bigram_flat(batch)
        bk = _dsir_buckets(big)
        n = batch.num_rows
        doc_big = np.bincount(parents, minlength=n)
        has = doc_big > 0  # <2-word docs have no features (SQL: no bg rows)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(doc_big, out=offs[1:])
        sums = (
            np.add.reduceat(self.m[bk], offs[:-1][has])
            if has.any()
            else np.zeros(0, np.int64)
        )
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[has]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(doc_big[has], pa.int64()),
                "dsir_micro": pa.array(sums, pa.int64()),
            }
        )


def q_dsir_weights(sf_dir: str):
    """(doc_id, n_bigrams, dsir_micro) — per-doc DSIR importance weight in
    integer micro-nats (sum over bigram occurrences of the smoothed
    log p_target/p_corpus of the bigram's hash bucket). Docs resembling the
    benchmark domain score high; resampling keeps the top-weight mass."""
    n_all, n_bench = dsir_histograms(sf_dir)
    return _dedup._docs(sf_dir).map_batches(
        DsirScorer,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"n_all": n_all, "n_bench": n_bench},
        **remote_kwargs(),
    )


def _dsir_sql() -> str:
    from .decontam import bench_pred_sql

    return f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                             x -> x != '') AS w
  FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM tk),
b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(bigram), 1, 12)) AS BIGINT)
           % {DSIR_DIM} AS bucket
  FROM bg),
hist AS (
  SELECT bucket, count(*) AS n_all,
         count(*) FILTER (WHERE {bench_pred_sql()}) AS n_bench
  FROM b GROUP BY 1),
tot AS (
  SELECT CAST(sum(n_all) AS DOUBLE) AS s_all,
         CAST(sum(n_bench) AS DOUBLE) AS s_bench
  FROM hist),
wt AS (
  SELECT bucket,
         CAST(round((ln((n_bench + 1) / (SELECT s_bench + {DSIR_DIM} FROM tot))
                   - ln((n_all + 1) / (SELECT s_all + {DSIR_DIM} FROM tot)))
                    * 1000000) AS BIGINT) AS m
  FROM hist)
SELECT b.doc_id AS doc_id, count(*) AS n_bigrams,
       CAST(sum(wt.m) AS BIGINT) AS dsir_micro
FROM b JOIN wt USING (bucket) GROUP BY 1
"""


register("corpus_dsir_weights", q_dsir_weights)
register_lazy_sql("corpus_dsir_weights", _dsir_sql)


def q_dsir_select(sf_dir: str):
    """The DSIR selection step: documents whose importance weight clears
    the corpus MEAN weight (floor(sum/|scored docs|) in micro-nats — an
    exact integer threshold; the paper resamples proportionally, the
    above-mean rule is the deterministic contract both engines can agree
    on bit-for-bit). After the histogram pass, ONE scoring scan: the tiny
    per-doc (doc_id, n_bigrams, dsir_micro) triple table is materialized
    (3 int64 per scored doc — ~24 GB per 10^12 docs across the whole
    object store, never on one node), the threshold folds from it as ONE
    (sum, count) row per block, and the filter re-reads the scored triples
    instead of re-hashing every bigram a second time."""
    import ray

    n_all, n_bench = dsir_histograms(sf_dir)
    kw = dict(
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"n_all": n_all, "n_bench": n_bench},
        **remote_kwargs(),
    )

    def moment_partial(t: pa.Table) -> pa.Table:
        w = t.column("dsir_micro").to_numpy(zero_copy_only=False)
        return pa.table(
            {"s": pa.array([int(w.sum())], pa.int64()),
             "n": pa.array([len(w)], pa.int64())}
        )

    scored = _dedup._docs(sf_dir).map_batches(DsirScorer, **kw).materialize()
    mom = (
        scored
        .map_batches(moment_partial, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    n = int(mom["n"].sum()) if len(mom) else 0
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_bigrams": pa.array([], pa.int64()),
             "dsir_micro": pa.array([], pa.int64())}
        )
    thresh = int(mom["s"].sum()) // n  # python floor div == SQL mirror's

    def keep(t: pa.Table) -> pa.Table:
        w = t.column("dsir_micro").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(w >= thresh))

    df = (
        scored
        .map_batches(keep, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "n_bigrams", "dsir_micro"]], preserve_index=False
    )


def _dsir_select_sql() -> str:
    # numpy-style FLOOR division of the (possibly negative) weight sum —
    # DuckDB // truncates toward zero (the eventops._floor_div_sql lesson),
    # and the divisor here is a runtime scalar, so inline the same
    # subtract-modulus form with scalar subqueries
    base = _dsir_sql()
    return f"""
WITH d AS ({base}),
t AS (SELECT ((sum(dsir_micro)) - (((sum(dsir_micro)) % count(*))
              + count(*)) % count(*)) // count(*) AS thresh FROM d)
SELECT d.doc_id AS doc_id, d.n_bigrams AS n_bigrams,
       d.dsir_micro AS dsir_micro
FROM d WHERE d.dsir_micro >= (SELECT thresh FROM t)
"""


register("corpus_dsir_select", q_dsir_select)
register_lazy_sql("corpus_dsir_select", _dsir_select_sql)
