"""Web-crawl URL canonicalization + dedup — the ingest-side dedup every
crawl pipeline runs before content dedup: strip fragment, strip query,
lowercase scheme+host (path stays case-sensitive), drop trailing slashes,
then keep one representative per canonical URL.

The canonicalization is the graded kernel: four RE2 operations per block
(replace fragment / query / trailing slashes, extract+lower the authority
prefix), all vectorized — Arrow's replace_substring_regex / extract_regex
and DuckDB's regexp_replace / regexp_extract are both RE2, so the mirror
can't diverge on regex semantics.

Input variants are synthesized deterministically from doc_id arithmetic
(two docs share each canonical URL; the variant class rotates query /
uppercase-host+fragment / trailing-slash mutations), mirrored in the SQL
so the driver's hash compare exercises the kernel end-to-end.

100-TB shape: the only exchange is the canonical-URL groupby, carrying
per-block pre-reduced (canonical, min_id, n) rows — one row per distinct
canonical per block, never raw page rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from ..rayenv import remote_kwargs

#: RE2 patterns shared (textually) with the SQL mirror
_FRAGMENT = "#.*$"
_QUERY = r"\?.*$"
_AUTHORITY = "^[^/]+//[^/]*"
_TRAILING = "/+$"


def canonicalize_urls(url: pa.Array) -> pa.Array:
    """Vectorized URL canonicalization (the graded kernel)."""
    u = pc.replace_substring_regex(url, pattern=_FRAGMENT, replacement="")
    u = pc.replace_substring_regex(u, pattern=_QUERY, replacement="")
    prefix = pc.struct_field(
        pc.extract_regex(u, pattern=f"(?P<p>{_AUTHORITY})"), "p"
    )
    rest = pc.replace_substring_regex(u, pattern=_AUTHORITY, replacement="")
    u = pc.binary_join_element_wise(pc.utf8_lower(prefix), rest, "")
    return pc.replace_substring_regex(u, pattern=_TRAILING, replacement="")


def make_url_variants(batch: pa.Table) -> pa.Table:
    """Generation stage (not graded): deterministic URL variants; two docs
    share each canonical target, variant class = doc_id % 4."""
    doc_ids = batch.column("doc_id").to_numpy()
    urls = []
    for doc_id in doc_ids:
        doc_id = int(doc_id)
        base = f"https://docs.example/{doc_id // 2:08d}"
        m = doc_id % 4
        if m == 1:
            urls.append(f"{base}?utm_source=feed&ref={doc_id % 7}")
        elif m == 2:
            urls.append(
                f"HTTPS://DOCS.Example/{doc_id // 2:08d}#sec-{doc_id % 3}"
            )
        elif m == 3:
            urls.append(base + "/")
        else:
            urls.append(base)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "url": pa.array(urls, pa.string())}
    )


def _canon_partials(batch: pa.Table) -> pa.Table:
    """Canonicalize + per-block pre-reduce: (canonical_url, min doc_id, n)."""
    curl = canonicalize_urls(batch.column("url").combine_chunks())
    cu = curl.to_numpy(zero_copy_only=False)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(cu) == 0:
        return pa.table(
            {"canonical_url": pa.array([], pa.string()),
             "keep_doc_id": pa.array([], pa.int64()),
             "n_variants": pa.array([], pa.int64())}
        )
    order = np.argsort(cu, kind="stable")
    cu_s, id_s = cu[order], ids[order]
    first = np.flatnonzero(np.concatenate([[True], cu_s[1:] != cu_s[:-1]]))
    return pa.table(
        {
            "canonical_url": pa.array(cu_s[first], pa.string()),
            "keep_doc_id": pa.array(
                np.minimum.reduceat(id_s, first), pa.int64()
            ),
            "n_variants": pa.array(
                np.diff(np.append(first, len(cu_s))).astype(np.int64),
                pa.int64(),
            ),
        }
    )


def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup: one row per canonical URL with the kept
    (minimum) doc_id and the variant count."""
    import ray.data
    from ray.data.aggregate import Min, Sum

    from .blockutil import retype_block

    df = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .map_batches(make_url_variants, batch_format="pyarrow",
                     **remote_kwargs())
        .map_batches(_canon_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("canonical_url")
        .aggregate(
            Min("keep_doc_id", alias_name="keep_doc_id"),
            Sum("n_variants", alias_name="n_variants"),
        )
        .map_batches(
            lambda t: retype_block(
                t,
                {"canonical_url": ("canonical_url", pa.string()),
                 "keep_doc_id": ("keep_doc_id", pa.int64()),
                 "n_variants": ("n_variants", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:  # zero-block dataset -> column-less empty frame
        return pa.table(
            {"canonical_url": pa.array([], pa.string()),
             "keep_doc_id": pa.array([], pa.int64()),
             "n_variants": pa.array([], pa.int64())}
        )
    df = df.sort_values("canonical_url").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["canonical_url", "keep_doc_id", "n_variants"]],
        preserve_index=False,
    )


_URL_DEDUP_SQL = f"""
WITH v AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 1 THEN 'https://docs.example/' || printf('%08d', doc_id // 2)
                       || '?utm_source=feed&ref=' || (doc_id % 7)
           WHEN 2 THEN 'HTTPS://DOCS.Example/' || printf('%08d', doc_id // 2)
                       || '#sec-' || (doc_id % 3)
           WHEN 3 THEN 'https://docs.example/' || printf('%08d', doc_id // 2)
                       || '/'
           ELSE 'https://docs.example/' || printf('%08d', doc_id // 2)
         END AS url
  FROM documents),
c AS (
  SELECT doc_id,
         regexp_replace(
           lower(regexp_extract(
             regexp_replace(regexp_replace(url, '{_FRAGMENT}', ''),
                            '{_QUERY}', ''),
             '{_AUTHORITY}'))
           || regexp_replace(
                regexp_replace(regexp_replace(url, '{_FRAGMENT}', ''),
                               '{_QUERY}', ''),
                '{_AUTHORITY}', ''),
           '{_TRAILING}', '') AS canonical_url
  FROM v)
SELECT canonical_url, min(doc_id) AS keep_doc_id, count(*) AS n_variants
FROM c GROUP BY 1 ORDER BY 1
"""

register("web_url_dedup", q_url_dedup, _URL_DEDUP_SQL)


# ---------------------------------------------------------------------------
# per-domain stats — the CCNet-style crawl report: docs / token mass /
# language diversity per registrable domain. Hosts are synthesized
# deterministically from doc_id with a SKEWED size distribution
# (floor(sqrt(doc_id % 400)) -> domain d holds ~2d+1 of every 400 docs),
# mirrored in the SQL so the hash compare exercises the whole fold.
#
# 100-TB shape: ONE (host, lang)-keyed exchange of per-block combiner rows
# (docs + token partials — never raw pages), then a tiny per-host groupby
# whose row count per group = the distinct-language count. No driver-side
# materialization of anything bigger than |domains| x |langs|.
# ---------------------------------------------------------------------------

_DOMAIN_MOD = 400
#: NULL lang travels as the NUL sentinel (Ray's sort-aggregate cannot
#: partition None keys); it only ever feeds the distinct-language COUNT, so
#: it never needs restoring — SQL's GROUP BY gives NULL its own group too.
_NULL_LANG = "\x00"


def _domain_partials(batch: pa.Table) -> pa.Table:
    """Per-block (host, lang) combiner: docs + ws-token partials. Group key
    = dom * |block langs| + factorized lang — exact at any lang length."""
    from .textstats import ws_token_counts

    ids = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    dom = np.floor(np.sqrt((ids % _DOMAIN_MOD).astype(np.float64))).astype(
        np.int64
    )
    lang = batch.column("lang").to_numpy(zero_copy_only=False)
    lang = np.where(
        pa.compute.is_null(batch.column("lang").combine_chunks())
        .to_numpy(zero_copy_only=False),
        _NULL_LANG,
        lang.astype(object),
    )
    toks = ws_token_counts(batch.column("text"))
    langs_uniq, lang_inv = np.unique(lang.astype(str), return_inverse=True)
    if len(ids) == 0:
        return pa.table(
            {"host": pa.array([], pa.string()),
             "lang": pa.array([], pa.string()),
             "docs": pa.array([], pa.int64()),
             "tokens": pa.array([], pa.int64())}
        )
    key = dom * len(langs_uniq) + lang_inv
    order = np.argsort(key, kind="stable")
    k, t = key[order], toks[order]
    first = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    gd = k[first] // len(langs_uniq)
    gl = langs_uniq[k[first] % len(langs_uniq)]
    host = np.array([f"d{int(x):02d}.example" for x in gd], dtype=object)
    return pa.table(
        {
            "host": pa.array(host, pa.string()),
            "lang": pa.array(gl.astype(object), pa.string()),
            "docs": pa.array(
                np.diff(np.append(first, len(k))).astype(np.int64), pa.int64()
            ),
            "tokens": pa.array(np.add.reduceat(t, first), pa.int64()),
        }
    )


def q_domain_stats(sf_dir: str):
    """Per-domain crawl report: doc count, ws-token mass, distinct-language
    count — over deterministically synthesized skewed domains."""
    import ray.data
    from ray.data.aggregate import Sum

    from .blockutil import retype_block

    per_lang = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )
        .map_batches(_domain_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["host", "lang"])
        .aggregate(Sum("docs", alias_name="docs"),
                   Sum("tokens", alias_name="tokens"))
    )

    def lang_rows(t: pa.Table) -> pa.Table:
        # aggregate output: sparse shuffle partitions arrive SCHEMA-LESS
        t = retype_block(
            t,
            {"host": ("host", pa.string()),
             "docs": ("docs", pa.int64()),
             "tokens": ("tokens", pa.int64())},
        )
        return pa.table(
            {"host": t.column("host"),
             "docs": t.column("docs"),
             "tokens": t.column("tokens"),
             "langs": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}
        )

    df = (
        per_lang.map_batches(lang_rows, batch_format="pyarrow",
                             **remote_kwargs())
        .groupby("host")
        .aggregate(Sum("docs", alias_name="n_docs"),
                   Sum("tokens", alias_name="n_tokens"),
                   Sum("langs", alias_name="n_langs"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"host": ("host", pa.string()),
                 "n_docs": ("n_docs", pa.int64()),
                 "n_tokens": ("n_tokens", pa.int64()),
                 "n_langs": ("n_langs", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:  # zero-block dataset -> column-less empty frame
        return pa.table(
            {"host": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64()),
             "n_langs": pa.array([], pa.int64())}
        )
    df = df.sort_values("host").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["host", "n_docs", "n_tokens", "n_langs"]], preserve_index=False
    )


_DOMAIN_STATS_SQL = f"""
WITH d AS (
  SELECT 'd' || printf('%02d',
           CAST(floor(sqrt(doc_id % {_DOMAIN_MOD})) AS BIGINT))
         || '.example' AS host,
         lang,
         coalesce((length(text) - length(replace(text, ' ', ''))) + 1, 0)
           AS toks
  FROM documents),
g AS (
  SELECT host, lang, count(*) AS docs,
         CAST(sum(toks) AS BIGINT) AS tokens
  FROM d GROUP BY 1, 2)
SELECT host, CAST(sum(docs) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_langs
FROM g GROUP BY 1 ORDER BY 1
"""

register("web_domain_stats", q_domain_stats, _DOMAIN_STATS_SQL)


# ---------------------------------------------------------------------------
# PageRank over the crawl link graph — the classic crawl-side quality prior
# (used by real pretraining pipelines to weight documents). The graph is
# synthesized deterministically from doc_id arithmetic (node i has
# outdeg = 1 + i%3, edge j -> (i*7 + j + 1) % N), and every quantity is
# FIXED-POINT int64 micro-units with floor division, so the distributed
# fold order cannot drift against the SQL mirror (which unrolls the same
# three iterations as integer CTEs) — an ITERATIVE algorithm under the
# driver's exact hash gate, not a rows-only check.
#
# 100-TB shape: per iteration, each rank block scatters (dst, contrib)
# combiner rows (pre-reduced per block) plus one (own_id, 0) row so
# zero-indegree nodes survive the groupby — the only exchange is that
# groupby; no rank-vector broadcast, no edge materialization (edges are
# functional in doc_id), no driver-side state. Iterations chain lazily and
# execute as one streaming DAG.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 3
_PR_INIT = 1_000_000  # micro-units: every node starts at rank 1.0
_PR_BASE = 150_000    # (1 - 0.85) in micro-units
_PR_DAMP = 85         # damping numerator (percent)
#: gather buckets per iteration. One bucket (~|edges|/PR_BUCKETS combiner
#: rows) must fit a block — at cluster scale set to O(total cores x 4),
#: same bounded-group contract as the IVF cells / pack buckets.
PR_BUCKETS = 256


def _pr_scatter(batch: pa.Table, n_nodes: int) -> pa.Table:
    """One PageRank scatter: per block emit pre-reduced (dst, contrib)
    rows + a (self, 0) row per node (keeps zero-indegree nodes alive)."""
    ids = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    rank = (
        batch.column("rank").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(ids) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "contrib": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int64())}
        )
    outdeg = 1 + ids % 3
    contrib = rank // outdeg
    dsts, vals = [ids], [np.zeros(len(ids), np.int64)]
    for j in range(3):
        m = outdeg > j
        dsts.append((ids[m] * 7 + j + 1) % n_nodes)
        vals.append(contrib[m])
    dst = np.concatenate(dsts)
    val = np.concatenate(vals)
    order = np.argsort(dst, kind="stable")
    d, v = dst[order], val[order]
    first = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    gd = d[first]
    return pa.table(
        {
            "doc_id": pa.array(gd, pa.int64()),
            "contrib": pa.array(np.add.reduceat(v, first), pa.int64()),
            # range bucket: the gather groups on ~PR_BUCKETS keys instead of
            # N doc_ids (Ray's hash aggregate measured ~3x the cost of a
            # coarse map_groups on the same rows at 1M nodes)
            "bucket": pa.array(
                gd * PR_BUCKETS // max(n_nodes, 1), pa.int64()
            ),
        }
    )


def _pagerank_ranks(sf_dir: str, op: str = "web_pagerank"):
    """The iterative rank DATASET (doc_id, rank in micro-units) — shared by
    q_pagerank and the rank-weighted sampler so the chained-iteration DAG
    is built once and each consumer attaches its own finish stage."""
    import ray.data

    from ..parquet_stats import file_num_rows

    path = os.path.join(sf_dir, "documents.parquet")
    n_nodes = file_num_rows(path)  # footers only (file OR dir-of-parts)
    _assert_contiguous_ids(path, n_nodes, op)

    def init_rank(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table(
            {"doc_id": ids,
             "rank": pa.array(
                 np.full(batch.num_rows, _PR_INIT, np.int64), pa.int64()
             )}
        )

    def fold_bucket(t: pa.Table) -> pa.Table:
        """One bucket's contrib rows -> that bucket's (doc_id, rank)."""
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("contrib").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64())}
            )
        order = np.argsort(d, kind="stable")
        d, v = d[order], v[order]
        first = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        s = np.add.reduceat(v, first)
        return pa.table(
            {"doc_id": pa.array(d[first], pa.int64()),
             "rank": pa.array(_PR_BASE + (_PR_DAMP * s) // 100, pa.int64())}
        )

    ranks = ray.data.read_parquet(path, columns=["doc_id"]).map_batches(
        init_rank, batch_format="pyarrow", **remote_kwargs()
    )
    for _ in range(PAGERANK_ITERS):
        ranks = (
            ranks.map_batches(
                lambda b, n=n_nodes: _pr_scatter(b, n),
                batch_format="pyarrow", **remote_kwargs(),
            )
            .groupby("bucket")
            .map_groups(fold_bucket, batch_format="pyarrow",
                        **remote_kwargs())
        )
    return ranks


def q_pagerank(sf_dir: str):
    """Integer fixed-point PageRank (3 iterations, damping 0.85) over the
    deterministic doc_id link graph. Output: doc_id, rank_micro."""
    from .blockutil import retype_block

    ranks = _pagerank_ranks(sf_dir)
    df = (
        ranks.map_batches(
            lambda t: retype_block(
                t,
                {"doc_id": ("doc_id", pa.int64()),
                 "rank_micro": ("rank", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:  # zero-block dataset -> column-less empty frame
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "rank_micro": pa.array([], pa.int64())}
        )
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "rank_micro"]], preserve_index=False
    )


def _pagerank_cte() -> tuple[str, str]:
    """(WITH-clause SQL, final relation name) for the unrolled integer
    PageRank — shared by the pagerank mirror and the rank-weighted sampler."""
    iters = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""
c{i} AS (
  SELECT e.dst AS doc_id,
         CAST(sum({prev}.rank // e.outdeg) AS BIGINT) AS s
  FROM edges e JOIN {prev} ON e.src = {prev}.doc_id GROUP BY 1),
r{i} AS (
  SELECT d.doc_id,
         {_PR_BASE} + ({_PR_DAMP} * coalesce(c{i}.s, 0)) // 100 AS rank
  FROM documents d LEFT JOIN c{i} ON d.doc_id = c{i}.doc_id)""")
        prev = f"r{i}"
    cte = f"""
WITH nodes AS (
  SELECT doc_id, 1 + doc_id % 3 AS outdeg FROM documents),
edges AS (
  SELECT doc_id AS src, outdeg,
         (doc_id * 7 + r.range + 1) % (SELECT count(*) FROM documents) AS dst
  FROM nodes CROSS JOIN range(3) r WHERE r.range < outdeg),
r0 AS (
  SELECT doc_id, CAST({_PR_INIT} AS BIGINT) AS rank FROM documents),{",".join(iters)}"""
    return cte, prev


def _pagerank_sql() -> str:
    cte, prev = _pagerank_cte()
    return f"{cte}\nSELECT doc_id, rank AS rank_micro FROM {prev} ORDER BY doc_id\n"


register("web_pagerank", q_pagerank, _pagerank_sql())


# ---------------------------------------------------------------------------
# rank-weighted document sample — the crawl-prior importance sample real
# pretraining pipelines draw (keep probability ∝ PageRank): composes the
# integer-exact PageRank fold with the repo's md5 importance-sampling
# contract (keep iff h48(doc_id) < rank_micro x scale — no float RNG, no
# cross-engine ULP risk; see sample_weighted_batch's md5 note).
#
# 100-TB shape: the sampler is ONE filter map_batches attached to the
# already-bounded PageRank DAG — no new exchange, no rank broadcast; the
# keep decision uses only the row's own (doc_id, rank).
# ---------------------------------------------------------------------------

#: keep iff h48(doc_id) < rank_micro * SCALE; at the rank mean (1.0 = 1e6
#: micro) the keep rate is SCALE * 1e6 / 2^48 ≈ 2% — and a page with 2x the
#: mean rank is exactly 2x as likely to survive
RANK_SAMPLE_SCALE = 5_600_000


def q_rank_weighted_sample(sf_dir: str):
    """(doc_id, rank_micro) for the PageRank-importance-sampled subset."""
    import hashlib

    from .blockutil import retype_block

    ranks = _pagerank_ranks(sf_dir, op="web_rank_weighted_sample")

    def keep(t: pa.Table) -> pa.Table:
        t = retype_block(
            t,
            {"doc_id": ("doc_id", pa.int64()),
             "rank_micro": ("rank", pa.int64())},
        )
        ids = t.column("doc_id").to_pylist()
        # md5 retained DELIBERATELY: the keep decision IS the hash value
        # (same mirrored contract as sample_weighted_batch)
        h48 = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
             for i in ids],
            dtype=np.int64,
        )
        rank = (
            t.column("rank_micro").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return t.filter(pa.array(h48 < rank * RANK_SAMPLE_SCALE))

    df = ranks.map_batches(
        keep, batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    if len(df) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "rank_micro": pa.array([], pa.int64())}
        )
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "rank_micro"]], preserve_index=False
    )


def _rank_sample_sql() -> str:
    cte, prev = _pagerank_cte()
    return f"""{cte}
SELECT doc_id, rank AS rank_micro FROM {prev}
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
      < rank * {RANK_SAMPLE_SCALE}
ORDER BY doc_id
"""


register("web_rank_weighted_sample", q_rank_weighted_sample,
         _rank_sample_sql())


# ---------------------------------------------------------------------------
# crawl-frontier reachability — BFS from a seed set over the same doc_id
# link graph as PageRank: which pages are within FRONTIER_HOPS clicks of a
# seed, and at what minimum depth. The iterative-TRAVERSAL counterpart to
# PageRank's scatter-gather: each hop flat-maps the current frontier to its
# successors (functional edges — nothing materializes the graph), levels
# union as (doc_id, hop) rows, and ONE range-bucket map_groups takes the
# per-node min hop (same PR_BUCKETS bounded-group contract). Frontier rows
# are two int64s; no visited-set broadcast, no driver-side state.
# ---------------------------------------------------------------------------

def _assert_contiguous_ids(path: str, n_nodes: int, op: str) -> None:
    """The arithmetic link graph is defined over doc_ids 0..N-1. Fail fast
    from footer statistics (no data read) when the corpus has gaps or an
    offset — otherwise the Ray scatter would route contributions to
    phantom ids while the SQL mirror (which joins back to `documents`)
    would not, and the hash gate would catch it only downstream."""
    if n_nodes == 0:
        return
    from ..parquet_stats import column_stats_bounds

    lo, hi = column_stats_bounds(path, "doc_id")
    if int(lo) != 0 or int(hi) != n_nodes - 1:
        raise ValueError(
            f"{op} requires contiguous doc_ids 0..N-1 (footer stats show"
            f" min={int(lo)}, max={int(hi)}, N={n_nodes}); re-index or map"
            " ids before building the arithmetic link graph"
        )


FRONTIER_HOPS = 2
FRONTIER_SEED_MOD = 97  # seeds: doc_id % 97 == 0 (~1% of the corpus)


def _frontier_expand(batch: pa.Table, n_nodes: int, hop: int) -> pa.Table:
    """Frontier block -> successor (doc_id, hop) rows, block-deduped."""
    ids = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    outdeg = 1 + ids % 3
    dsts = []
    for j in range(3):
        m = outdeg > j
        dsts.append((ids[m] * 7 + j + 1) % n_nodes)
    dst = np.unique(np.concatenate(dsts)) if len(ids) else np.array(
        [], np.int64
    )
    return pa.table(
        {"doc_id": pa.array(dst, pa.int64()),
         "hop": pa.array(np.full(len(dst), hop, np.int64), pa.int64())}
    )


def q_crawl_frontier(sf_dir: str):
    """(doc_id, hop): minimum click depth from the seed set within
    FRONTIER_HOPS hops, seeds at hop 0."""
    import ray.data

    from .blockutil import retype_block
    from ..parquet_stats import file_num_rows

    path = os.path.join(sf_dir, "documents.parquet")
    n_nodes = file_num_rows(path)
    _assert_contiguous_ids(path, n_nodes, "web_crawl_frontier")

    def seed_rows(batch: pa.Table) -> pa.Table:
        ids = (
            batch.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        s = ids[ids % FRONTIER_SEED_MOD == 0]
        return pa.table(
            {"doc_id": pa.array(s, pa.int64()),
             "hop": pa.array(np.zeros(len(s), np.int64), pa.int64())}
        )

    levels = [
        ray.data.read_parquet(path, columns=["doc_id"]).map_batches(
            seed_rows, batch_format="pyarrow", **remote_kwargs()
        )
    ]
    for hop in range(1, FRONTIER_HOPS + 1):
        levels.append(
            levels[-1].map_batches(
                lambda b, n=n_nodes, h=hop: _frontier_expand(b, n, h),
                batch_format="pyarrow", **remote_kwargs(),
            )
        )
    union = levels[0]
    for lv in levels[1:]:
        union = union.union(lv)

    def bucketize(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket", pa.array(d * PR_BUCKETS // max(n_nodes, 1), pa.int64())
        )

    def min_hop(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column("hop").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "hop": pa.array([], pa.int64())}
            )
        order = np.lexsort((h, d))
        d, h = d[order], h[order]
        first = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        return pa.table(
            {"doc_id": pa.array(d[first], pa.int64()),
             "hop": pa.array(h[first], pa.int64())}
        )

    df = (
        union.map_batches(bucketize, batch_format="pyarrow",
                          **remote_kwargs())
        .groupby("bucket")
        .map_groups(min_hop, batch_format="pyarrow", **remote_kwargs())
        .map_batches(
            lambda t: retype_block(
                t,
                {"doc_id": ("doc_id", pa.int64()),
                 "hop": ("hop", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:  # zero-block dataset -> column-less empty frame
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "hop": pa.array([], pa.int64())}
        )
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df[["doc_id", "hop"]], preserve_index=False)


def _frontier_sql() -> str:
    hops = ["SELECT doc_id, 0 AS hop FROM seeds"]
    prev = "seeds"
    ctes = []
    for h in range(1, FRONTIER_HOPS + 1):
        ctes.append(f"""
h{h} AS (
  SELECT DISTINCT (e.dst) AS doc_id
  FROM edges e JOIN {prev} ON e.src = {prev}.doc_id)""")
        hops.append(f"SELECT doc_id, {h} AS hop FROM h{h}")
        prev = f"h{h}"
    return f"""
WITH nodes AS (
  SELECT doc_id, 1 + doc_id % 3 AS outdeg FROM documents),
edges AS (
  SELECT doc_id AS src,
         (doc_id * 7 + r.range + 1) % (SELECT count(*) FROM documents) AS dst
  FROM nodes CROSS JOIN range(3) r WHERE r.range < outdeg),
seeds AS (
  SELECT doc_id FROM documents WHERE doc_id % {FRONTIER_SEED_MOD} = 0),{",".join(ctes)}
SELECT doc_id, CAST(min(hop) AS BIGINT) AS hop
FROM ({" UNION ALL ".join(hops)})
GROUP BY 1 ORDER BY 1
"""


register("web_crawl_frontier", q_crawl_frontier, _frontier_sql())


# ---------------------------------------------------------------------------
# link reciprocity — the link-spam / link-farm signal: what fraction of
# directed links is reciprocated (A->B and B->A)? Mutual-link density far
# above the organic web's baseline marks exchange schemes. Over the same
# arithmetic doc_id graph as PageRank/BFS.
#
# 100-TB shape: edges never materialize (functional in doc_id); each block
# emits canonical (lo, hi, dir, bucket) rows — dir 1 = lo->hi, 2 = hi->lo,
# globally unique per (pair, dir) by construction, so a per-bucket SUM of
# dir is the OR of directions (3 = reciprocal). ONE range-bucket map_groups
# folds each bucket to a (n_edges, n_reciprocal) partial (same PR_BUCKETS
# bounded-group contract as PageRank's gather), and the driver sums
# <= PR_BUCKETS partial rows into the single summary row.
# ---------------------------------------------------------------------------

def _recip_scatter(batch: pa.Table, n_nodes: int) -> pa.Table:
    ids = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(ids) == 0:
        return pa.table(
            {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()),
             "dir": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int64())}
        )
    outdeg = 1 + ids % 3
    srcs, dsts = [], []
    for j in range(3):
        m = outdeg > j
        srcs.append(ids[m])
        dsts.append((ids[m] * 7 + j + 1) % n_nodes)
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    keep = s != d  # self-links carry no reciprocity signal
    s, d = s[keep], d[keep]
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    dirbit = np.where(s < d, 1, 2).astype(np.int64)
    return pa.table(
        {
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "dir": pa.array(dirbit, pa.int64()),
            "bucket": pa.array(lo * PR_BUCKETS // max(n_nodes, 1), pa.int64()),
        }
    )


def _recip_fold(group: pa.Table) -> pa.Table:
    """One bucket -> (n_edges, n_reciprocal) partial: sum dir per (lo, hi)
    — each (pair, dir) row is globally unique, so sum == bitwise OR."""
    lo = group.column("lo").to_numpy(zero_copy_only=False).astype(np.int64)
    hi = group.column("hi").to_numpy(zero_copy_only=False).astype(np.int64)
    dr = group.column("dir").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(lo) == 0:
        return pa.table(
            {"n_edges": pa.array([], pa.int64()),
             "n_reciprocal": pa.array([], pa.int64())}
        )
    order = np.lexsort((hi, lo))
    lo_s, hi_s, dr_s = lo[order], hi[order], dr[order]
    first = np.flatnonzero(np.concatenate(
        [[True], (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])]
    ))
    dirs = np.add.reduceat(dr_s, first)
    recip = int((dirs == 3).sum())
    return pa.table(
        {"n_edges": pa.array([len(first) + recip], pa.int64()),
         "n_reciprocal": pa.array([recip], pa.int64())}
    )


def q_link_reciprocity(sf_dir: str):
    """One summary row: n_edges (directed, non-self), n_reciprocal_pairs,
    reciprocity = reciprocated directed edges / all directed edges."""
    import ray.data

    from ..parquet_stats import file_num_rows

    path = os.path.join(sf_dir, "documents.parquet")
    n_nodes = file_num_rows(path)
    _assert_contiguous_ids(path, n_nodes, "web_link_reciprocity")
    parts = (
        ray.data.read_parquet(path, columns=["doc_id"])
        .map_batches(lambda b: _recip_scatter(b, n_nodes),
                     batch_format="pyarrow", **remote_kwargs())
        .groupby("bucket")
        .map_groups(_recip_fold, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()  # <= PR_BUCKETS partial rows
    )
    if len(parts) == 0 or "n_edges" not in parts.columns:
        return pa.table(
            {"n_edges": pa.array([0], pa.int64()),
             "n_reciprocal_pairs": pa.array([0], pa.int64()),
             "reciprocity": pa.array([0.0], pa.float64())}
        )
    ne = int(parts["n_edges"].sum())
    nr = int(parts["n_reciprocal"].sum())
    return pa.table(
        {
            "n_edges": pa.array([ne], pa.int64()),
            "n_reciprocal_pairs": pa.array([nr], pa.int64()),
            "reciprocity": pa.array(
                [round(2.0 * nr / ne, 6) if ne else 0.0], pa.float64()
            ),
        }
    )


_RECIPROCITY_SQL = """
WITH nodes AS (
  SELECT doc_id, 1 + doc_id % 3 AS outdeg FROM documents),
edges AS (
  SELECT doc_id AS src,
         (doc_id * 7 + r.range + 1) % (SELECT count(*) FROM documents) AS dst
  FROM nodes CROSS JOIN range(3) r WHERE r.range < outdeg),
e AS (SELECT src, dst FROM edges WHERE src <> dst),
p AS (SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
             sum(CASE WHEN src < dst THEN 1 ELSE 2 END) AS dirs
      FROM e GROUP BY 1, 2)
SELECT CAST(sum(1 + CASE WHEN dirs = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_edges,
       CAST(sum(CASE WHEN dirs = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reciprocal_pairs,
       round(2.0 * sum(CASE WHEN dirs = 3 THEN 1 ELSE 0 END)
             / sum(1 + CASE WHEN dirs = 3 THEN 1 ELSE 0 END), 6)
         AS reciprocity
FROM p
"""

register("web_link_reciprocity", q_link_reciprocity, _RECIPROCITY_SQL)


# ---------------------------------------------------------------------------
# per-domain document quota (crawl balancing) — the curation step that stops
# a handful of giant hosts from dominating a training corpus (C4/RefinedWeb
# style per-domain caps). Keep the CAP_K crawl-priority-smallest doc_ids per
# registrable domain (the same skewed synthesized hosts as web_domain_stats,
# so big domains saturate the cap while the tail passes through untouched).
#
# 100-TB shape: per-block combiner keeps <= CAP_K candidates per domain
# present in the block (vectorized segment-rank mask, no sort of the corpus),
# so the exchange carries <= |domains| x CAP_K x blocks (domain, doc_id)
# rows; one bounded groupby(domain).map_groups picks the global smallest K.
# No global sort, no full-row shuffle.
# ---------------------------------------------------------------------------

#: 25 binds at the driver's 500-doc gate tables (domains 6-9 and 13-19
#: saturate, the small tail passes through) so BOTH regimes are hash-checked
DOMAIN_CAP_K = 25


def _cap_partials(batch: pa.Table) -> pa.Table:
    ids = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(ids) == 0:
        return pa.table(
            {"domain": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64())}
        )
    dom = np.floor(np.sqrt((ids % _DOMAIN_MOD).astype(np.float64))).astype(
        np.int64
    )
    order = np.lexsort((ids, dom))
    d_s, i_s = dom[order], ids[order]
    first = np.flatnonzero(np.concatenate([[True], d_s[1:] != d_s[:-1]]))
    seg_len = np.diff(np.append(first, len(d_s)))
    rank_in_seg = np.arange(len(d_s)) - np.repeat(first, seg_len)
    keep = rank_in_seg < DOMAIN_CAP_K
    return pa.table(
        {"domain": pa.array(d_s[keep], pa.int64()),
         "doc_id": pa.array(i_s[keep], pa.int64())}
    )


def _cap_group(g: pa.Table) -> pa.Table:
    """One domain's candidate pool (<= CAP_K x blocks rows, bounded):
    global smallest-K selection + 1-based crawl-priority rank."""
    ids = np.sort(g.column("doc_id").to_numpy(zero_copy_only=False))[
        :DOMAIN_CAP_K
    ]
    dom = int(g.column("domain")[0].as_py())
    return pa.table(
        {
            "host": pa.array(
                [f"d{dom:02d}.example"] * len(ids), pa.string()
            ),
            "doc_id": pa.array(ids, pa.int64()),
            "rank": pa.array(
                np.arange(1, len(ids) + 1, dtype=np.int64), pa.int64()
            ),
        }
    )


def q_domain_cap(sf_dir: str):
    import ray.data

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .map_batches(_cap_partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("domain")
        .map_groups(_cap_group, batch_format="pyarrow", **remote_kwargs())
    )


_DOMAIN_CAP_SQL = f"""
WITH r AS (
  SELECT doc_id,
         CAST(floor(sqrt(doc_id % {_DOMAIN_MOD})) AS BIGINT) AS dom,
         row_number() OVER (
           PARTITION BY floor(sqrt(doc_id % {_DOMAIN_MOD}))
           ORDER BY doc_id) AS rank
  FROM documents)
SELECT 'd' || CASE WHEN dom < 10 THEN '0' ELSE '' END || dom
         || '.example' AS host,
       doc_id, rank
FROM r WHERE rank <= {DOMAIN_CAP_K}
"""

register("web_domain_cap", q_domain_cap, _DOMAIN_CAP_SQL)


# ---------------------------------------------------------------------------
# HITS hubs & authorities over the same deterministic crawl link graph —
# the OTHER classic link-analysis prior (Kleinberg): a page is a good HUB
# if it links to good authorities, a good AUTHORITY if good hubs link to
# it. Two fixed alternating iterations, PURE integer sums (HITS has no
# outdegree division, so unlike PageRank there is no floor-div to mirror —
# parity is exact by construction; normalization at a fixed iteration
# count is a monotone rescale and deliberately omitted).
#
# 100-TB shape: each half-iteration is ONE range-bucket groupby over
# (node, src, value) edge rows — the authority fold at dst re-emits each
# in-edge keyed by its src, so the hub fold needs no edge inversion and no
# rank-vector broadcast; exchange is 2 x |edges| x ~32B rows per
# iteration, pre-reduced per block like the PageRank scatter. Zero
# in-degree nodes survive via (self, -1, 0) keep-alive rows.
# ---------------------------------------------------------------------------

HITS_ITERS = 2
_HITS_INIT = 1_000_000  # hub micro-units at t=0


def _hits_scatter(batch: pa.Table, n_nodes: int) -> pa.Table:
    """(node=dst, src, value=h_src) edge rows + (self, -1, 0) keep-alives,
    bucketed by dst for the authority fold."""
    ids = (
        batch.column("doc_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    h = batch.column("hub").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()),
             "src": pa.array([], pa.int64()),
             "value": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int64())}
        )
    outdeg = 1 + ids % 3
    nodes, srcs, vals = [ids], [np.full(len(ids), -1, np.int64)], [
        np.zeros(len(ids), np.int64)
    ]
    for j in range(3):
        m = outdeg > j
        nodes.append((ids[m] * 7 + j + 1) % n_nodes)
        srcs.append(ids[m])
        vals.append(h[m])
    node = np.concatenate(nodes)
    return pa.table(
        {
            "node": pa.array(node, pa.int64()),
            "src": pa.array(np.concatenate(srcs), pa.int64()),
            "value": pa.array(np.concatenate(vals), pa.int64()),
            "bucket": pa.array(node * PR_BUCKETS // max(n_nodes, 1),
                               pa.int64()),
        }
    )


def _hits_auth_fold(n_nodes: int, emit_auth: bool):
    """Authority fold at dst: a_dst = sum of incoming h. Re-emits each
    in-edge as (node=src, a_dst) bucketed by src for the hub fold, plus —
    on the final iteration — an (node=dst, src=-1, a_dst) carry row so the
    finish stage sees both scores."""

    def fold(t: pa.Table) -> pa.Table:
        d = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {"node": pa.array([], pa.int64()),
             "src": pa.array([], pa.int64()),
             "value": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int64())}
        )
        if len(d) == 0:
            return empty
        order = np.argsort(d, kind="stable")
        d, s, v = d[order], s[order], v[order]
        first = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        a = np.add.reduceat(v, first)  # per-dst authority
        # broadcast a_dst back onto this group's edge rows
        seg = np.zeros(len(d), np.int64)
        seg[first] = 1
        a_of_row = a[np.cumsum(seg) - 1]
        real = s >= 0
        out_node = [s[real]]
        out_src = [np.full(int(real.sum()), -1, np.int64)]
        out_val = [a_of_row[real]]
        if emit_auth:  # final-iteration carry: (dst, src=-2, a_dst)
            out_node.append(d[first])
            out_src.append(np.full(len(first), -2, np.int64))
            out_val.append(a)
        node = np.concatenate(out_node)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "src": pa.array(np.concatenate(out_src), pa.int64()),
                "value": pa.array(np.concatenate(out_val), pa.int64()),
                "bucket": pa.array(node * PR_BUCKETS // max(n_nodes, 1),
                                   pa.int64()),
            }
        )

    return fold


def _hits_hub_fold(final: bool):
    """Hub fold at src: h_src = sum of its out-neighbors' authorities.
    Intermediate form returns (doc_id, hub); final form also pivots the
    src=-2 authority carry rows into auth_micro."""

    def fold(t: pa.Table) -> pa.Table:
        d = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            if final:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "hub_micro": pa.array([], pa.int64()),
                     "auth_micro": pa.array([], pa.int64())}
                )
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "hub": pa.array([], pa.int64())}
            )
        order = np.argsort(d, kind="stable")
        d, s, v = d[order], s[order], v[order]
        first = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
        uniq = d[first]
        is_edge = (s == -1).astype(np.int64)
        hub = np.add.reduceat(v * is_edge, first)
        if not final:
            return pa.table(
                {"doc_id": pa.array(uniq, pa.int64()),
                 "hub": pa.array(hub, pa.int64())}
            )
        auth = np.add.reduceat(v * (s == -2).astype(np.int64), first)
        return pa.table(
            {"doc_id": pa.array(uniq, pa.int64()),
             "hub_micro": pa.array(hub, pa.int64()),
             "auth_micro": pa.array(auth, pa.int64())}
        )

    return fold


def q_hits(sf_dir: str):
    """(doc_id, hub_micro, auth_micro) — HITS after HITS_ITERS alternating
    integer iterations (h0 = 1e6) over the doc_id link graph."""
    import ray.data

    from ..parquet_stats import file_num_rows

    path = os.path.join(sf_dir, "documents.parquet")
    n_nodes = file_num_rows(path)
    _assert_contiguous_ids(path, n_nodes, "web_hits")

    def init_hub(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "hub": pa.array(
                 np.full(batch.num_rows, _HITS_INIT, np.int64), pa.int64()
             )}
        )

    ds = ray.data.read_parquet(path, columns=["doc_id"]).map_batches(
        init_hub, batch_format="pyarrow", **remote_kwargs()
    )
    for t in range(HITS_ITERS):
        last = t == HITS_ITERS - 1
        ds = (
            ds.map_batches(
                lambda b, n=n_nodes: _hits_scatter(b, n),
                batch_format="pyarrow", **remote_kwargs(),
            )
            .groupby("bucket")
            .map_groups(_hits_auth_fold(n_nodes, emit_auth=last),
                        batch_format="pyarrow", **remote_kwargs())
            .groupby("bucket")
            .map_groups(_hits_hub_fold(final=last),
                        batch_format="pyarrow", **remote_kwargs())
        )
    df = ds.to_pandas()
    if len(df) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "hub_micro": pa.array([], pa.int64()),
             "auth_micro": pa.array([], pa.int64())}
        )
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "hub_micro", "auth_micro"]], preserve_index=False
    )


def _hits_sql() -> str:
    """Unrolled integer HITS mirror — shares the edges CTE shape with
    _pagerank_cte (no division anywhere, so the two engines cannot drift)."""
    parts = [f"""
WITH nodes AS (
  SELECT doc_id, 1 + doc_id % 3 AS outdeg FROM documents),
edges AS (
  SELECT doc_id AS src,
         (doc_id * 7 + r.range + 1) % (SELECT count(*) FROM documents) AS dst
  FROM nodes CROSS JOIN range(3) r WHERE r.range < outdeg),
h0 AS (SELECT doc_id, CAST({_HITS_INIT} AS BIGINT) AS h FROM documents)"""]
    prev = "h0"
    for i in range(1, HITS_ITERS + 1):
        parts.append(f""",
a{i} AS (
  SELECT e.dst AS doc_id, CAST(sum({prev}.h) AS BIGINT) AS a
  FROM edges e JOIN {prev} ON e.src = {prev}.doc_id GROUP BY 1),
af{i} AS (
  SELECT d.doc_id, coalesce(a{i}.a, 0) AS a
  FROM documents d LEFT JOIN a{i} USING (doc_id)),
h{i} AS (
  SELECT e.src AS doc_id, CAST(sum(af{i}.a) AS BIGINT) AS h
  FROM edges e JOIN af{i} ON e.dst = af{i}.doc_id GROUP BY 1)""")
        prev = f"h{i}"
    n = HITS_ITERS
    return "".join(parts) + f"""
SELECT d.doc_id AS doc_id, coalesce(h{n}.h, 0) AS hub_micro,
       af{n}.a AS auth_micro
FROM documents d LEFT JOIN h{n} USING (doc_id)
JOIN af{n} USING (doc_id) ORDER BY 1
"""


register("web_hits", q_hits, _hits_sql())


# ---------------------------------------------------------------------------
# weakly-connected components over a deterministic intra-block link graph —
# puts the DISTRIBUTED hash-to-min CC kernel (dedup.connected_components,
# otherwise only reachable through the rows-only minhash keep-set) under
# the driver's exact hash gate: the component label is exactly "minimum
# reachable doc_id", which a DuckDB recursive CTE reproduces bit-for-bit.
#
# Graph: node i links to i+j (j = 1, and also 2 when i is odd) iff the
# target stays inside i's WEB_CC_BLOCK-sized block and the corpus — so
# components are the blocks (chains of ~97 plus a tail block), several
# per corpus, sizes visible in the output. Isolated nodes (a 1-node tail
# block) are their own component via the join-back.
# ---------------------------------------------------------------------------

WEB_CC_BLOCK = 97


def q_web_components(sf_dir: str):
    """(doc_id, component) — component = min doc_id weakly reachable over
    the deterministic intra-block edges, computed by the distributed
    hash-to-min CC (broadcast/sharded auto mode)."""
    import ray.data

    from ..parquet_stats import file_num_rows
    from .dedup import connected_components

    path = os.path.join(sf_dir, "documents.parquet")
    n = file_num_rows(path)
    _assert_contiguous_ids(path, n, "web_components")

    def edges_fn(batch: pa.Table) -> pa.Table:
        ids = (
            batch.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        xs, ys = [], []
        for j in (1, 2):
            m = (
                (j <= 1 + ids % 2)
                & ((ids + j) // WEB_CC_BLOCK == ids // WEB_CC_BLOCK)
                & (ids + j < n)
            )
            xs.append(ids[m])
            ys.append(ids[m] + j)
        return pa.table(
            {"x": pa.array(np.concatenate(xs), pa.int64()),
             "y": pa.array(np.concatenate(ys), pa.int64())}
        )

    edges = ray.data.read_parquet(path, columns=["doc_id"]).map_batches(
        edges_fn, batch_format="pyarrow", **remote_kwargs()
    )
    import pandas as pd

    cc = connected_components(edges).to_pandas()
    all_ids = (
        ray.data.read_parquet(path, columns=["doc_id"])
        .to_pandas()["doc_id"].astype(np.int64)
    )
    out = pd.DataFrame({"doc_id": all_ids}).merge(
        cc.rename(columns={"node": "doc_id"}), on="doc_id", how="left"
    )
    out["component"] = (
        out["component"].fillna(out["doc_id"]).astype(np.int64)
    )
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["doc_id", "component"]], preserve_index=False
    )


_WEB_CC_SQL = f"""
WITH RECURSIVE e AS (
  SELECT doc_id AS x, doc_id + t.j AS y
  FROM documents, LATERAL (SELECT unnest([1, 2]) AS j) t
  WHERE t.j <= 1 + doc_id % 2
    AND (doc_id + t.j) // {WEB_CC_BLOCK} = doc_id // {WEB_CC_BLOCK}
    AND doc_id + t.j < (SELECT count(*) FROM documents)),
sym AS (SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e),
r(n, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.x, r.l FROM sym s JOIN r ON s.y = r.n)
SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS component
FROM r GROUP BY 1 ORDER BY 1
"""

register("web_components", q_web_components, _WEB_CC_SQL)
