"""Exact distributed per-group quantiles — the exact counterpart to the
histogram-quantile sketch (`sketch.py`), the same way `events_distinct_users
_exact` sits next to the HLL sketch: measure the trade, don't guess it.

Scale shape (two-phase, nothing materializes the raw rows):

1. Per-block combiner quantizes the value to an exact int64 grid (micros for
   float metrics; identity for already-integer ones) and emits DISTINCT
   ``(key, v, cnt)`` rows — the only rows that ever shuffle. A global
   ``groupby((key, v)).Sum`` folds the partials into the per-key value
   DISTRIBUTION table: one row per distinct (key, value), NOT per input row.
2. ``groupby(key).map_groups`` co-locates each key's distribution and picks
   the target order statistics from the cumulative counts with ONE
   vectorized searchsorted.

The bounded-group contract (same as the kNN IVF cells and pack buckets):
one key's DISTINCT quantized values must fit a block. That holds when the
metric has bounded resolution (a 1e-6 grid over a bounded metric range is at
most ~millions of distinct cells no matter how many input rows hash into
them); a group past ``QUANTILE_MAX_GROUP`` fails fast with a pointer at the
histogram sketch, which is the right tool for unbounded-cardinality values.

Rank contract (shared with the DuckDB mirror, integer arithmetic only):
the p-th percentile of n values is the zero-based order statistic
``((n - 1) * p) // 100`` — the "lower" interpolation, exact in both engines.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .entry_queries import register, register_lazy_sql
from ..rayenv import remote_kwargs

#: percentiles reported by every quantile query (integer percents)
PCTS = (25, 50, 75, 90, 99)

#: max DISTINCT quantized values per key group (one group must fit a block;
#: 4M rows x ~24 B ≈ 100 MB). Past this, use sketch_value_quantiles.
QUANTILE_MAX_GROUP = 4_000_000


def _dist_partials(key: np.ndarray, v: np.ndarray, key_name: str) -> pa.Table:
    """Per-block (key, v, cnt) distinct-value partial counts."""
    if len(key) == 0:
        return pa.table(
            {key_name: pa.array([], pa.string()),
             "v": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )
    order = np.lexsort((v, key))
    k_s, v_s = key[order], v[order]
    boundary = (k_s[1:] != k_s[:-1]) | (v_s[1:] != v_s[:-1])
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    return pa.table(
        {
            key_name: pa.array(k_s[first], pa.string()),
            "v": pa.array(v_s[first], pa.int64()),
            "cnt": pa.array(
                np.diff(np.append(first, len(k_s))).astype(np.int64),
                pa.int64(),
            ),
        }
    )


def _select_quantiles(group: pa.Table, key_name: str) -> pa.Table:
    """One key's distribution -> one row of order statistics."""
    if group.num_rows == 0:
        cols = {key_name: pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        for p in PCTS:
            cols[f"p{p}"] = pa.array([], pa.int64())
        return pa.table(cols)
    if group.num_rows > QUANTILE_MAX_GROUP:
        raise ValueError(
            f"quantile group for {key_name}="
            f"{group.column(key_name)[0].as_py()!r} has {group.num_rows} "
            f"distinct values (> QUANTILE_MAX_GROUP={QUANTILE_MAX_GROUP}); "
            "the exact path requires one key's distinct quantized values to "
            "fit a block — use sketch_value_quantiles for unbounded-"
            "cardinality metrics or coarsen the quantization grid"
        )
    v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = group.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, cnt = v[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    targets = np.array([((n - 1) * p) // 100 for p in PCTS], dtype=np.int64)
    idx = np.searchsorted(cum, targets, side="right")
    cols = {
        key_name: pa.array([group.column(key_name)[0].as_py()], pa.string()),
        "n": pa.array([n], pa.int64()),
    }
    for p, i in zip(PCTS, idx):
        cols[f"p{p}"] = pa.array([int(v[i])], pa.int64())
    return pa.table(cols)


def _distribution_fold(ds, make_partials, key_name: str, select_fn):
    """The shared two-phase bounded-distribution engine: combiner ->
    groupby((key, v)).Sum -> per-key selection. ``make_partials`` emits
    per-block (key_name, v:int64, cnt:int64) partial weights; ``select_fn``
    receives ONE key's folded distribution table with the same columns.
    Also the pass-1 engine of text_perplexity_buckets and
    corpus_token_budget (cnt = token mass there)."""
    from ray.data.aggregate import Sum

    def resum(t: pa.Table) -> pa.Table:
        from .blockutil import retype_block

        return retype_block(
            t,
            {key_name: (key_name, pa.string()),
             "v": ("v", pa.int64()),
             "cnt": ("sum(cnt)", pa.int64())},
        )

    return (
        ds.map_batches(make_partials, batch_format="pyarrow",
                       **remote_kwargs())
        .groupby([key_name, "v"])
        .aggregate(Sum("cnt"))
        .map_batches(resum, batch_format="pyarrow", **remote_kwargs())
        .groupby(key_name)
        .map_groups(select_fn, batch_format="pyarrow", **remote_kwargs())
    )


def _grouped_quantiles(ds, make_partials, key_name: str):
    """read -> combiner -> groupby((key,v)).Sum -> per-key selection."""
    out = _distribution_fold(
        ds, make_partials, key_name,
        lambda g: _select_quantiles(g, key_name),
    )
    df = out.to_pandas()
    if len(df) == 0:
        cols = {key_name: pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        for p in PCTS:
            cols[f"p{p}"] = pa.array([], pa.int64())
        return pa.table(cols)
    return df.sort_values(key_name).reset_index(drop=True)


def q_events_value_quantiles_exact(sf_dir: str):
    """Exact per-event-type value percentiles (micro-quantized — the same
    1e-6 grid every float contract in this repo uses)."""
    import ray.data

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.drop_null()
        key = (
            t.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        )
        vm = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64)
        return _dist_partials(key, vm, "event_type")

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )
    df = _grouped_quantiles(ds, partials, "event_type")
    if isinstance(df, pa.Table):
        cols = {"event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        for p in PCTS:
            cols[f"p{p}"] = pa.array([], pa.float64())
        return pa.table(cols)
    for p in PCTS:
        df[f"p{p}"] = (df[f"p{p}"] / 1_000_000.0).round(6)
    return pa.Table.from_pandas(
        df[["event_type", "n"] + [f"p{p}" for p in PCTS]],
        preserve_index=False,
    )


_EVENTS_Q_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
r AS (
  SELECT event_type, vm,
         row_number() OVER (PARTITION BY event_type ORDER BY vm) - 1 AS rk
  FROM v),
n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1)
SELECT r.event_type, max(n.n) AS n,
{", ".join(
    f"       round(max(CASE WHEN r.rk = ((n.n - 1) * {p}) // 100 "
    f"THEN r.vm END) / 1000000.0, 6) AS p{p}" for p in PCTS
)}
FROM r JOIN n USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def q_text_length_quantiles(sf_dir: str):
    """Exact per-language document-length percentiles (n_chars is already
    integral — identity quantization)."""
    import ray.data

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.drop_null()
        key = t.column("lang").to_numpy(zero_copy_only=False).astype(str)
        v = (
            t.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return _dist_partials(key, v, "lang")

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "n_chars"],
    )
    df = _grouped_quantiles(ds, partials, "lang")
    if isinstance(df, pa.Table):
        return df
    return pa.Table.from_pandas(
        df[["lang", "n"] + [f"p{p}" for p in PCTS]], preserve_index=False
    )


_TEXT_LEN_Q_SQL = f"""
WITH v AS (
  SELECT lang, n_chars AS vm FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
r AS (
  SELECT lang, vm,
         row_number() OVER (PARTITION BY lang ORDER BY vm) - 1 AS rk
  FROM v),
n AS (SELECT lang, count(*) AS n FROM v GROUP BY 1)
SELECT r.lang, max(n.n) AS n,
{", ".join(
    f"       max(CASE WHEN r.rk = ((n.n - 1) * {p}) // 100 "
    f"THEN r.vm END) AS p{p}" for p in PCTS
)}
FROM r JOIN n USING (lang)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# quantile-broadcast filter — the "compute a distributed statistic, then
# filter the corpus by it" composition: per-language median length from the
# exact-quantile engine (tiny |langs| table on the driver), broadcast into a
# second streaming scan that keeps docs at/above their language's median.
# Two passes over the corpus, both streaming; the only materialized state is
# the |langs|-row median table.
# ---------------------------------------------------------------------------


def _lang_medians(sf_dir: str) -> dict[str, int]:
    import ray.data

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.drop_null()
        key = t.column("lang").to_numpy(zero_copy_only=False).astype(str)
        v = (
            t.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return _dist_partials(key, v, "lang")

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "n_chars"],
    )
    df = _grouped_quantiles(ds, partials, "lang")
    if isinstance(df, pa.Table):  # empty corpus
        return {}
    return dict(zip(df["lang"], df["p50"].astype(int)))


def q_above_median_length(sf_dir: str):
    """Docs at/above their language's median length: count + total chars
    per language (the kept-mass report a mixture planner consumes)."""
    import ray.data
    from ray.data.aggregate import Sum

    medians = _lang_medians(sf_dir)
    empty = pa.table(
        {"lang": pa.array([], pa.string()),
         "median": pa.array([], pa.int64()),
         "n_kept": pa.array([], pa.int64()),
         "total_chars": pa.array([], pa.int64())}
    )
    if not medians:
        return empty
    langs_sorted = np.array(sorted(medians), dtype=object)
    meds_sorted = np.array(
        [medians[l] for l in langs_sorted], dtype=np.int64
    )

    def keep_partials(batch: pa.Table) -> pa.Table:
        t = batch.drop_null()
        lang = t.column("lang").to_numpy(zero_copy_only=False).astype(str)
        v = (
            t.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pos = np.searchsorted(langs_sorted.astype(str), lang)
        pos = np.minimum(pos, len(langs_sorted) - 1)
        known = langs_sorted[pos].astype(str) == lang
        keep = known & (v >= meds_sorted[pos])
        lang, v = lang[keep], v[keep]
        if len(lang) == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "chars": pa.array([], pa.int64())}
            )
        order = np.argsort(lang, kind="stable")
        l_s, v_s = lang[order], v[order]
        first = np.flatnonzero(np.concatenate([[True], l_s[1:] != l_s[:-1]]))
        return pa.table(
            {
                "lang": pa.array(l_s[first], pa.string()),
                "n": pa.array(
                    np.diff(np.append(first, len(l_s))).astype(np.int64),
                    pa.int64(),
                ),
                "chars": pa.array(np.add.reduceat(v_s, first), pa.int64()),
            }
        )

    df = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["lang", "n_chars"],
        )
        .map_batches(keep_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("lang")
        .aggregate(Sum("n"), Sum("chars"))
        .to_pandas()
    )
    if len(df) == 0:
        return empty
    df = df.rename(columns={"sum(n)": "n_kept", "sum(chars)": "total_chars"})
    df["median"] = df["lang"].map(medians).astype(np.int64)
    df = df.sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["lang", "median", "n_kept", "total_chars"]],
        preserve_index=False,
    )


_ABOVE_MEDIAN_SQL = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS rk
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
n AS (SELECT lang, count(*) AS n FROM r GROUP BY 1),
m AS (
  SELECT r.lang,
         max(CASE WHEN r.rk = ((n.n - 1) * 50) // 100
             THEN r.n_chars END) AS median
  FROM r JOIN n USING (lang) GROUP BY 1)
SELECT d.lang, max(m.median) AS median, count(*) AS n_kept,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN m ON d.lang = m.lang
WHERE d.n_chars >= m.median
GROUP BY 1 ORDER BY 1
"""


def q_norm_quantiles(sf_dir: str):
    """Exact per-label embedding-norm² percentiles — the quantile engine
    over a list<float> column. The norm² is an EXACT integer contract:
    each element's square is quantized to micros BEFORE the per-vector sum
    (float32 → float64 upcast and double multiply are bit-identical in
    numpy and DuckDB; the integer sum is order-independent), so the
    distribution — and therefore the selected order statistics — cannot
    drift between engines."""
    import ray.data

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        labels = (
            batch.column("label").to_numpy(zero_copy_only=False)
            .astype(np.int64).astype(str)
        )
        if batch.num_rows == 0:
            return _dist_partials(
                np.array([], dtype=object), np.array([], dtype=np.int64),
                "label",
            )
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = np.asarray(col.offsets)
        q = np.rint(flat * flat * 1_000_000).astype(np.int64)
        norm2 = np.add.reduceat(q, offs[:-1])
        norm2[offs[:-1] == offs[1:]] = 0  # empty vectors sum to 0
        return _dist_partials(labels, norm2, "label")

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding", "label"],
    )
    df = _grouped_quantiles(ds, partials, "label")
    if isinstance(df, pa.Table):
        return df
    return pa.Table.from_pandas(
        df[["label", "n"] + [f"p{p}" for p in PCTS]], preserve_index=False
    )


_NORM_Q_SQL = f"""
WITH v AS (
  SELECT CAST(label AS VARCHAR) AS label,
         COALESCE(CAST(list_sum(list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000)
                AS BIGINT))) AS BIGINT), 0) AS vm
  FROM embeddings),
r AS (
  SELECT label, vm,
         row_number() OVER (PARTITION BY label ORDER BY vm) - 1 AS rk
  FROM v),
n AS (SELECT label, count(*) AS n FROM v GROUP BY 1)
SELECT r.label, max(n.n) AS n,
{", ".join(
    f"       max(CASE WHEN r.rk = ((n.n - 1) * {p}) // 100 "
    f"THEN r.vm END) AS p{p}" for p in PCTS
)}
FROM r JOIN n USING (label)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# GLOBAL percent_rank without a global sort — the broadcast-CDF shape. A
# naive distributed percent_rank() is sort(value) over every row (the worst
# all-to-all at 100 TB). Instead: phase 1 folds the bounded distinct-value
# distribution (the same two-phase engine as the exact quantiles — values
# are milli-quantized, so the distribution is grid-bounded, not row-
# bounded), the driver turns it into a (sorted values, counts-below) CDF
# broadcast via ray.put, and phase 2 resolves every event's rank with one
# searchsorted per block. No row ever shuffles; the only exchange carries
# distinct (v, cnt) cells. percent_rank = cnt_smaller / (n-1) — both
# engines compute the identical double division, so 6dp rounding agrees.
# ---------------------------------------------------------------------------


def q_value_percent_rank(sf_dir: str):
    """Per-event global percent_rank of `value` (ties share a rank):
    two-phase distribution fold + broadcast-CDF searchsorted, no global
    sort."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def dist_partials(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("value").is_valid())
        if t.num_rows == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        vm = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1000
        ).astype(np.int64)
        u, c = np.unique(vm, return_counts=True)
        return pa.table(
            {"v": pa.array(u, pa.int64()),
             "cnt": pa.array(c.astype(np.int64), pa.int64())}
        )

    dist = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["value"]
        )
        .map_batches(dist_partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded by the quantization grid, not by rows
    )
    empty = pa.table(
        {"event_id": pa.array([], pa.int64()),
         "vm": pa.array([], pa.int64()),
         "pct_rank": pa.array([], pa.float64())}
    )
    if len(dist) == 0:
        return empty
    if len(dist) > QUANTILE_MAX_GROUP:
        raise ValueError(
            f"value distribution has {len(dist)} distinct milli-quantized "
            f"cells (> QUANTILE_MAX_GROUP={QUANTILE_MAX_GROUP}); the "
            "broadcast-CDF rank requires a grid-bounded distribution — "
            "coarsen the quantization grid"
        )
    v = dist["v"].to_numpy(np.int64)
    c = dist["cnt"].to_numpy(np.int64)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    cum_below = np.cumsum(c) - c  # rows strictly smaller than v[i]
    n = int(c.sum())
    cdf_ref = ray.put((v, cum_below, n))

    def rank_map(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("value").is_valid())
        if t.num_rows == 0:
            return empty
        vv, cb, n = ray.get(cdf_ref)
        vm = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1000
        ).astype(np.int64)
        pos = np.searchsorted(vv, vm)  # exact hit: phase 1 saw every value
        pct = (
            np.round(cb[pos] / (n - 1), 6)
            if n > 1
            else np.zeros(len(vm), dtype=np.float64)
        )
        return pa.table(
            {
                "event_id": pa.array(
                    t.column("event_id").to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
                "vm": pa.array(vm, pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "value"],
        )
        .map_batches(rank_map, batch_format="pyarrow", **remote_kwargs())
    )


_PCT_RANK_SQL = """
WITH v AS (
  SELECT event_id, CAST(round(value * 1000) AS BIGINT) AS vm
  FROM events WHERE value IS NOT NULL)
SELECT event_id, vm, round(percent_rank() OVER (ORDER BY vm), 6) AS pct_rank
FROM v
"""


register(
    "events_value_quantiles_exact", q_events_value_quantiles_exact,
    _EVENTS_Q_SQL,
)
register("events_value_percent_rank", q_value_percent_rank, _PCT_RANK_SQL)
register("similarity_norm_quantiles", q_norm_quantiles, _NORM_Q_SQL)
register("text_length_quantiles", q_text_length_quantiles, _TEXT_LEN_Q_SQL)
register("text_above_median_length", q_above_median_length, _ABOVE_MEDIAN_SQL)


# ---------------------------------------------------------------------------
# robust dispersion: exact per-group median absolute deviation (MAD) — two
# chained distribution folds on the same bounded-distribution engine: pass 1
# selects each type's median, broadcast as a tiny (type -> median) map;
# pass 2 folds the |v - median| distribution and selects ITS median. Both
# passes exchange only distinct (key, value-cell, cnt) rows; raw events
# never shuffle. Same integer rank contract as every quantile mirror.
# ---------------------------------------------------------------------------


def _select_p50(group: pa.Table, key_name: str) -> pa.Table:
    """One key's distribution -> (key, n, p50) — the median-only selector."""
    if group.num_rows == 0:
        return pa.table(
            {key_name: pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "p50": pa.array([], pa.int64())}
        )
    if group.num_rows > QUANTILE_MAX_GROUP:
        raise ValueError(
            f"MAD group {group.column(key_name)[0].as_py()!r} exceeds "
            f"QUANTILE_MAX_GROUP={QUANTILE_MAX_GROUP} distinct cells; use "
            "sketch_value_quantiles"
        )
    v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = group.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, cnt = v[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    i = int(np.searchsorted(cum, ((n - 1) * 50) // 100, side="right"))
    return pa.table(
        {key_name: pa.array([group.column(key_name)[0].as_py()], pa.string()),
         "n": pa.array([n], pa.int64()),
         "p50": pa.array([int(v[i])], pa.int64())}
    )


def q_events_value_mad(sf_dir: str):
    """Exact per-event-type (median, MAD) of value on the 1e-6 grid."""
    import ray
    import ray.data

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.drop_null()
        key = (
            t.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        )
        vm = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64)
        return _dist_partials(key, vm, "event_type")

    def read():
        return ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )

    med_df = _distribution_fold(
        read(), partials, "event_type",
        lambda g: _select_p50(g, "event_type"),
    ).to_pandas()
    if len(med_df) == 0:
        return pa.table(
            {"event_type": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "median": pa.array([], pa.float64()),
             "mad": pa.array([], pa.float64())}
        )
    med_keys = np.sort(med_df["event_type"].to_numpy(str))
    med_vals = (
        med_df.set_index("event_type").loc[med_keys, "p50"]
        .to_numpy(np.int64)
    )
    med_ref = ray.put((med_keys, med_vals))

    def dev_partials(batch: pa.Table) -> pa.Table:
        keys, meds = ray.get(med_ref)
        t = batch.drop_null()
        key = (
            t.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        )
        vm = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64)
        pos = np.searchsorted(keys, key)
        dev = np.abs(vm - meds[pos])
        return _dist_partials(key, dev, "event_type")

    mad_df = _distribution_fold(
        read(), dev_partials, "event_type",
        lambda g: _select_p50(g, "event_type"),
    ).to_pandas()
    out = med_df.merge(
        mad_df.rename(columns={"p50": "mad_micro"})[["event_type",
                                                     "mad_micro"]],
        on="event_type",
    )
    out["median"] = (out["p50"] / 1_000_000.0).round(6)
    out["mad"] = (out["mad_micro"] / 1_000_000.0).round(6)
    out = out.sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["event_type", "n", "median", "mad"]], preserve_index=False
    )


_MAD_SQL = """
WITH v AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
r AS (SELECT event_type, vm,
             row_number() OVER (PARTITION BY event_type ORDER BY vm) - 1
               AS rk
      FROM v),
med AS (SELECT r.event_type,
               max(CASE WHEN r.rk = ((n.n - 1) * 50) // 100
                   THEN r.vm END) AS med
        FROM r JOIN n USING (event_type) GROUP BY 1),
a AS (SELECT v.event_type, abs(v.vm - med.med) AS av
      FROM v JOIN med USING (event_type)),
r2 AS (SELECT event_type, av,
              row_number() OVER (PARTITION BY event_type ORDER BY av) - 1
                AS rk
       FROM a),
mad AS (SELECT r2.event_type,
               max(CASE WHEN r2.rk = ((n.n - 1) * 50) // 100
                   THEN r2.av END) AS mad
        FROM r2 JOIN n USING (event_type) GROUP BY 1)
SELECT n.event_type, n.n,
       round(med.med / 1000000.0, 6) AS median,
       round(mad.mad / 1000000.0, 6) AS mad
FROM n JOIN med USING (event_type) JOIN mad USING (event_type)
ORDER BY 1
"""

register("events_value_mad", q_events_value_mad, _MAD_SQL)


# ---------------------------------------------------------------------------
# session-duration percentiles — the product-analytics composition: the
# sort+segment sessionization fold (eventops) feeds the bounded-
# distribution quantile engine. Durations are already integer micros, so
# the distribution cells are exact; the single global key makes the final
# selection one group (guarded by QUANTILE_MAX_GROUP like every exact
# quantile). Only distinct (duration, cnt) cells ever shuffle.
# ---------------------------------------------------------------------------


def q_session_duration_quantiles(sf_dir: str):
    """One row: n sessions + p25/50/75/90/99 of session duration in
    seconds (6dp), composed from events_sessionization."""
    from . import eventops as _ev

    def partials(batch: pa.Table) -> pa.Table:
        dur = (
            batch.column("end_us").to_numpy(zero_copy_only=False)
            .astype(np.int64)
            - batch.column("start_us").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        key = np.full(len(dur), "all", dtype=object)
        return _dist_partials(key, dur, "k")

    sessions = _ev.q_sessionization(sf_dir)
    df = _grouped_quantiles(sessions, partials, "k")
    if isinstance(df, pa.Table):  # empty-input sentinel from the helper
        cols = {"n": pa.array([], pa.int64())}
        for p in PCTS:
            cols[f"p{p}"] = pa.array([], pa.float64())
        return pa.table(cols)
    for p in PCTS:
        df[f"p{p}"] = (df[f"p{p}"] / 1_000_000.0).round(6)
    return pa.Table.from_pandas(
        df[["n"] + [f"p{p}" for p in PCTS]], preserve_index=False
    )


def _session_q_sql() -> str:
    from .eventops import SESSION_CTES

    pct_cols = ",\n       ".join(
        f"round(max(CASE WHEN rk = ((n.nn - 1) * {p}) // 100 "
        f"THEN d.dur END) / 1000000.0, 6) AS p{p}" for p in PCTS
    )
    return f"""
WITH {SESSION_CTES},
dur AS (
  SELECT epoch_us(max(ts)) - epoch_us(min(ts)) AS dur
  FROM s GROUP BY user_id, sid),
d AS (SELECT dur, row_number() OVER (ORDER BY dur) - 1 AS rk FROM dur),
n AS (SELECT count(*) AS nn FROM dur)
SELECT n.nn AS n,
       {pct_cols}
FROM d, n GROUP BY 1
"""


register("events_session_duration_quantiles", q_session_duration_quantiles)
# SQL composes eventops' SESSION_GAP_US -> deferred (worker-side direct
# imports re-enter entry_queries while eventops is mid-init; see the
# LAZY_ORACLE_SQL note in entry_queries.py)
register_lazy_sql("events_session_duration_quantiles", _session_q_sql)
