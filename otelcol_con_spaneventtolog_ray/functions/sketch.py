"""HyperLogLog distinct-count sketch as a two-phase Ray Data aggregate.

The sketch shape: each ``map_batches`` task folds its batch into one
4096-register HLL PER KEY (the combiner — only |keys| x 4KB rows ever leave a
task), then ``groupby(key).map_groups`` merges registers with an elementwise
max and evaluates the estimator (with the standard linear-counting
small-range correction). Only sketches cross the exchange, never rows — the
same partial/merge shape the per-sink counts use, which is what makes
count-distinct feasible at 100 TB.

Driver query is rows-only (the estimate is approximate by construction);
tests pin the estimator against exact distinct counts (<2% error at the
cardinalities involved) and the merge against a single-shot sketch.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .entry_queries import register
from ..rayenv import remote_kwargs

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA_M = 0.7213 / (1 + 1.079 / HLL_M)  # standard alpha for m >= 128


from .texthash import _splitmix64  # shared 64-bit mixer  # noqa: E402


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    bl = np.zeros(len(x), dtype=np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def hll_fold(values: np.ndarray) -> np.ndarray:
    """int64 values -> one HLL register array (uint8, len HLL_M)."""
    h = _splitmix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    tail = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rho = (64 - HLL_P) - _bit_length_u64(tail) + 1  # tail==0 -> max rho
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimator + linear-counting small-range correction."""
    regs = regs.astype(np.float64)
    e = _ALPHA_M * HLL_M * HLL_M / np.sum(2.0 ** -regs)
    zeros = int((regs == 0).sum())
    if e <= 2.5 * HLL_M and zeros > 0:
        e = HLL_M * np.log(HLL_M / zeros)
    return float(e)


def hll_partial_batch(key: str, value: str):
    """map_batches combiner: one (key, registers) row per key per batch."""

    def _fold(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        vals = batch.column(value).to_numpy(zero_copy_only=False).astype(np.int64)
        out_k, out_r = [], []
        for k in pd.unique(keys):
            out_k.append(k)
            out_r.append(hll_fold(vals[keys == k]).tobytes())
        return pa.table(
            {
                key: pa.array(out_k, pa.string()),
                "regs": pa.array(out_r, pa.binary(HLL_M)),
            }
        )

    return _fold


def hll_merge_group(key: str):
    """map_groups reducer: elementwise-max merge + estimate per key.

    Arrow in/out (zero-copy from the object store): the fixed-width binary
    register column's single data buffer reshapes straight into the
    (rows, HLL_M) uint8 matrix — no pandas detour."""

    def _merge(t: pa.Table) -> pa.Table:
        regs_col = t.column("regs")
        if isinstance(regs_col, pa.ChunkedArray):
            regs_col = regs_col.combine_chunks()
        regs = np.frombuffer(
            regs_col.buffers()[1], dtype=np.uint8
        )[regs_col.offset * HLL_M:(regs_col.offset + t.num_rows) * HLL_M].reshape(
            t.num_rows, HLL_M
        )
        merged = regs.max(axis=0)
        return pa.table(
            {
                key: t.column(key).slice(0, 1),
                "approx_distinct": pa.array(
                    [int(round(hll_estimate(merged)))], pa.int64()
                ),
            }
        )

    return _merge


def approx_distinct_by(ds, key: str, value: str):
    """Dataset -> (key, approx_distinct) via the two-phase HLL sketch."""
    partial = ds.map_batches(
        hll_partial_batch(key, value), batch_format="pyarrow", **remote_kwargs()
    )
    return partial.groupby(key).map_groups(
        hll_merge_group(key), batch_format="pyarrow", **remote_kwargs()
    )


def q_hll_distinct_users(sf_dir: str):
    """Approximate distinct users per event_type (rows-only: approximate by
    construction; the estimator/merge are pinned by unit tests)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    return approx_distinct_by(ds, "event_type", "user_id")


# ---------------------------------------------------------------------------
# streaming quantile sketch: fixed-resolution histogram whose value range
# comes from the parquet FOOTER min/max statistics (no extra data pass).
# Per-batch (key, bin) count partials are the combiner — only
# |keys| x Q_BINS tiny rows cross the exchange — and the driver interpolates
# quantiles inside the winning bin. Deterministic (no sampling); the
# estimate stays within one bin width of the exact enclosing order
# statistics. Rows-only: approximate by construction; accuracy pinned in
# pytest.
# ---------------------------------------------------------------------------

Q_BINS = 2048
QUANTILES = (0.5, 0.9, 0.99)


def _column_stats_bounds(path: str, column: str) -> tuple[float, float]:
    """(min, max) of a numeric column from footer statistics (shared helper;
    all-null row groups skipped); scan fallback only without any stats."""
    from ..parquet_stats import column_stats_bounds

    lo, hi = column_stats_bounds(path, column)
    return float(lo), float(hi)


def histogram_partial_batch(key: str, value: str, lo: float, hi: float):
    """map_batches combiner: (key, bin, n) rows; bin = clipped linear bin."""
    width = (hi - lo) or 1.0

    def _fold(batch: pa.Table) -> pa.Table:
        # NULL/NaN values are EXCLUDED (SQL quantile semantics) — a NaN cast
        # to int64 is INT64_MIN, which clip would silently fold into bin 0
        import pyarrow.compute as pc

        vcol = batch.column(value)
        ok = pc.and_kleene(
            pc.is_valid(vcol), pc.invert(pc.is_nan(pc.cast(vcol, pa.float64())))
        )
        # NULL keys dropped on both engines (mirror filters; pandas groupby
        # was dropping NaN keys implicitly — now explicit, parity fuzz)
        ok = pc.and_kleene(ok, pc.is_valid(batch.column(key)))
        okm = np.nan_to_num(
            ok.to_numpy(zero_copy_only=False), nan=False
        ).astype(bool)
        if not okm.all():
            batch = batch.filter(pa.array(okm))
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        vals = batch.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.clip(
            ((vals - lo) / width * Q_BINS).astype(np.int64), 0, Q_BINS - 1
        )
        import pandas as pd_

        df = pd_.DataFrame({key: keys, "bin": bins})
        g = df.groupby([key, "bin"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                key: pa.array(g[key], pa.string()),
                "bin": pa.array(g["bin"].to_numpy(), pa.int32()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    return _fold


def quantiles_from_histogram(
    bins: np.ndarray, counts: np.ndarray, lo: float, hi: float, qs
) -> list[float]:
    """Linear interpolation inside the bin containing each quantile rank."""
    width = ((hi - lo) or 1.0) / Q_BINS
    order = np.argsort(bins)
    bins, counts = bins[order], counts[order]
    cum = np.cumsum(counts)
    total = int(cum[-1])
    out = []
    for q in qs:
        rank = q * (total - 1)
        i = int(np.searchsorted(cum, rank + 1e-9, side="right"))
        i = min(i, len(bins) - 1)
        prev = int(cum[i - 1]) if i > 0 else 0
        inside = (rank - prev) / max(int(counts[i]), 1)
        # NO rounding: identical float64 inputs through identical ops are
        # bit-equal across engines; Python round (half-even) vs DuckDB
        # round (half-away) would diverge on x.0000005-family doubles
        out.append(lo + (bins[i] + min(inside, 1.0)) * width)
    return out


def q_value_quantiles(sf_dir: str):
    """Approximate per-event_type quantiles of `value` (p50/p90/p99) via the
    histogram sketch. Accuracy: the estimate lies within one bin width of the
    exact enclosing order statistics (a histogram tracks the data, not
    quantile_cont's between-points interpolation, which on sparse data can
    land many bins from any observation) — pinned in pytest.

    SQL-gated: the sketch is DETERMINISTIC (footer-stats bounds + linear
    binning + fixed interpolation), so a DuckDB mirror reproduces the
    estimates exactly — the oracle checks the sketch's arithmetic, not an
    exact quantile."""
    import ray.data

    path = os.path.join(sf_dir, "events.parquet")
    lo, hi = _column_stats_bounds(path, "value")
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])
    parts = ds.map_batches(
        histogram_partial_batch("event_type", "value", lo, hi),
        batch_format="pyarrow",
        **remote_kwargs(),
    )
    # phase B: merge partials per (key, bin) — tiny — then fold per key
    merged = (
        parts.groupby(["event_type", "bin"]).sum("n").to_pandas()
    )
    rows = []
    for key, grp in merged.groupby("event_type", sort=True):
        vals = quantiles_from_histogram(
            grp["bin"].to_numpy(),
            grp["sum(n)"].to_numpy(),
            lo,
            hi,
            QUANTILES,
        )
        rows.append(
            {"event_type": key, "p50": vals[0], "p90": vals[1], "p99": vals[2]}
        )
    import pandas as pd_

    return pa.Table.from_pandas(pd_.DataFrame(rows), preserve_index=False)


# ---------------------------------------------------------------------------
# Bloom filter membership — the seen-set primitive (e.g. "has this user ever
# purchased" / "was this URL already crawled") as a two-phase Ray aggregate:
# each task folds its batch into ONE fixed-size bit array (the combiner),
# the tiny per-block partials OR together on the driver, and the merged
# filter broadcasts once for the probe pass. Only BLOOM_BITS/8 bytes per
# block ever cross the exchange, never a key — the point of the sketch at
# 100 TB, where the exact seen-set is too large to broadcast. The query
# probes every distinct user and ALSO computes exact membership so the
# false-positive trade is measurable from the output (same both-sides
# pattern as HLL vs events_distinct_users_exact); the exact side is
# calibration-only and would be dropped at scale.
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # 8 KB filter: sized for fixture cardinalities; at
#                       1e9 keys use ~2^33 bits (1 GB, still one broadcast)
#: tree-reduce fan-in for fixed-size sketch partials (Bloom bits / CMS
#: counters): each fold task merges this many per-block rows into one
SKETCH_FOLD_WIDTH = 512
BLOOM_K = 3
BLOOM_TARGET_TYPE = "purchase"
_BLOOM_SEED = np.uint64(0xA0761D6478BD642F)


def bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) bit positions; K independent splitmix64 streams."""
    out = np.empty((len(keys), BLOOM_K), dtype=np.int64)
    k = keys.astype(np.uint64)
    for j in range(BLOOM_K):
        with np.errstate(over="ignore"):
            h = _splitmix64(k ^ (_BLOOM_SEED * np.uint64(j + 1)))
        out[:, j] = (h % np.uint64(BLOOM_BITS)).astype(np.int64)
    return out


def bloom_fold(keys: np.ndarray) -> np.ndarray:
    """Fold int64 keys into one packed uint64[BLOOM_BITS/64] bit array."""
    bits = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    if len(keys):
        pos = bloom_positions(keys).ravel()
        np.bitwise_or.at(
            bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
        )
    return bits


def bloom_contains(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    pos = bloom_positions(keys)
    hit = np.ones(len(keys), dtype=bool)
    for j in range(BLOOM_K):
        p = pos[:, j]
        hit &= (bits[p // 64] >> (p % 64).astype(np.uint64)) & np.uint64(1) == 1
    return hit


def q_bloom_users(sf_dir: str):
    """(user_id, bloom_hit, true_hit) for every distinct user: membership of
    the '{BLOOM_TARGET_TYPE}' seen-set via the broadcast Bloom filter vs
    exact. No false negatives by construction; FPR pinned in pytest."""
    import ray
    import ray.data

    path = os.path.join(sf_dir, "events.parquet")

    def partial(batch: pa.Table) -> pa.Table:
        mask = pa.compute.equal(batch.column("event_type"), BLOOM_TARGET_TYPE)
        keys = (
            batch.filter(mask).column("user_id")
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"bits": pa.array([bloom_fold(keys).tobytes()],
                                          pa.binary())})

    def or_fold(t: pa.Table) -> pa.Table:
        """Tree-reduce stage: OR up to SKETCH_FOLD_WIDTH partial rows into
        one, so the driver reads O(blocks / width) sketches, not one per
        input block (at 10^12 rows the flat partial stream would be tens of
        GB on the driver)."""
        acc = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
        for b in t.column("bits").to_pylist():
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    ds = ray.data.read_parquet(path, columns=["user_id", "event_type"])
    parts = (
        ds.map_batches(partial, batch_format="pyarrow", **remote_kwargs())
        .map_batches(or_fold, batch_format="pyarrow",
                     batch_size=SKETCH_FOLD_WIDTH, **remote_kwargs())
        .to_pandas()
    )
    bits = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    if "bits" in parts.columns:  # empty datasets lose their schema
        for b in parts["bits"]:
            bits |= np.frombuffer(b, dtype=np.uint64)

    # exact seen-set (calibration only): distinct purchaser ids
    truth = (
        ray.data.read_parquet(path, columns=["user_id", "event_type"])
        .map_batches(
            lambda b: b.filter(
                pa.compute.equal(b.column("event_type"), BLOOM_TARGET_TYPE)
            ).select(["user_id"]),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .groupby("user_id")
        .count()
        .to_pandas()
    )
    true_ids = (
        np.sort(truth["user_id"].to_numpy().astype(np.int64))
        if len(truth) and "user_id" in truth.columns
        else np.zeros(0, dtype=np.int64)
    )
    bits_ref = ray.put((bits, true_ids))

    def probe(t: pa.Table) -> pa.Table:
        fbits, tids = ray.get(bits_ref)
        users = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hit = bloom_contains(fbits, users)
        pos = np.searchsorted(tids, users)
        pos[pos == len(tids)] = 0
        exact = (tids[pos] == users) if len(tids) else np.zeros(len(users), bool)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "bloom_hit": pa.array(hit, pa.bool_()),
                "true_hit": pa.array(exact, pa.bool_()),
            }
        )

    return (
        ray.data.read_parquet(path, columns=["user_id"])
        .groupby("user_id")
        .count()
        .map_batches(probe, batch_format="pyarrow", **remote_kwargs())
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — linear frequency sketch as the same partial/merge
# shape: each task folds its batch's token stream into a D x W counter
# matrix (64 KB), partials SUM elementwise (CMS is linear), and the merged
# sketch answers point queries with est >= true and
# est - true <= e/W * N_tokens w.h.p. The query estimates the exact top-K
# tokens' counts from the sketch next to their true counts, so the
# accuracy trade is measurable from the output. At 100 TB the sketch
# replaces the (token, count) exchange of an exact count with
# O(blocks x 64 KB) — independent of vocabulary size.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 2048
CMS_TOP_K = 10
_CMS_SEED = np.uint64(0xE7037ED1A0B428DB)


def _cms_rows(word_hashes: np.ndarray) -> np.ndarray:
    """(D, n) column indices for each token hash."""
    out = np.empty((CMS_D, len(word_hashes)), dtype=np.int64)
    for d in range(CMS_D):
        with np.errstate(over="ignore"):
            h = _splitmix64(word_hashes ^ (_CMS_SEED * np.uint64(d + 1)))
        out[d] = (h % np.uint64(CMS_W)).astype(np.int64)
    return out


def cms_fold(word_hashes: np.ndarray) -> np.ndarray:
    cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(word_hashes):
        idx = _cms_rows(word_hashes)
        for d in range(CMS_D):
            cms[d] += np.bincount(idx[d], minlength=CMS_W)
    return cms


def cms_estimate(cms: np.ndarray, word_hashes: np.ndarray) -> np.ndarray:
    idx = _cms_rows(word_hashes)
    est = cms[0][idx[0]]
    for d in range(1, CMS_D):
        est = np.minimum(est, cms[d][idx[d]])
    return est


def q_cms_top_tokens(sf_dir: str):
    """(rank, token, n, est_n): the exact corpus top-K tokens (same
    deterministic order as text_top_tokens) with their Count-Min estimates
    alongside the true counts. est_n >= n always; the additive error bound
    is pinned in pytest."""
    from ..stages.aggregate import counts_by
    from .texthash import batch_words, word_hash_scalar
    from .textstats import _docs, _words_token_table, make_local_topk_block

    def partial(batch: pa.Table) -> pa.Table:
        wh, _parents, _offs = batch_words(batch.column("text"))
        return pa.table({"cms": pa.array([cms_fold(wh).tobytes()],
                                         pa.binary())})

    def sum_fold(t: pa.Table) -> pa.Table:
        """Tree-reduce stage (see q_bloom_users.or_fold): CMS is linear, so
        partials SUM; the driver reads O(blocks / width) sketches."""
        acc = np.zeros(CMS_D * CMS_W, dtype=np.int64)
        for b in t.column("cms").to_pylist():
            acc += np.frombuffer(b, dtype=np.int64)
        return pa.table({"cms": pa.array([acc.tobytes()], pa.binary())})

    parts = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow", **remote_kwargs())
        .map_batches(sum_fold, batch_format="pyarrow",
                     batch_size=SKETCH_FOLD_WIDTH, **remote_kwargs())
        .to_pandas()
    )
    cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if "cms" in parts.columns:  # empty datasets lose their schema
        for b in parts["cms"]:
            cms += np.frombuffer(b, dtype=np.int64).reshape(CMS_D, CMS_W)

    counts = counts_by(
        _docs(sf_dir).map_batches(
            _words_token_table, batch_format="pyarrow", **remote_kwargs()
        ),
        ["token"],
    )
    partials = counts.map_batches(
        make_local_topk_block(CMS_TOP_K), batch_format="pyarrow",
        **remote_kwargs()
    ).to_pandas()
    if len(partials) == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "token": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "est_n": pa.array([], pa.int64())}
        )
    df = partials.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable"
    ).head(CMS_TOP_K).reset_index(drop=True)
    wh = np.array(
        [word_hash_scalar(t) for t in df["token"]], dtype=np.uint64
    )
    df["est_n"] = cms_estimate(cms, wh)
    df["rank"] = range(1, len(df) + 1)
    return pa.Table.from_pandas(
        df[["rank", "token", "n", "est_n"]], preserve_index=False
    )


# DuckDB mirror of the deterministic histogram-quantile sketch: same
# footer-derived (min, max) bounds, same clipped linear bin, same
# present-bins cumulative search (first bin with cum > rank + 1e-9), same
# within-bin interpolation and operation ORDER (w/Q_BINS computed first,
# matching quantiles_from_histogram) so float64 results are bit-identical.
_VALUE_QUANTILES_SQL = f"""
WITH bounds AS (
  SELECT min(value) AS lo, max(value) AS hi,
         CASE WHEN max(value) - min(value) = 0 THEN 1.0
              ELSE max(value) - min(value) END AS w
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
hist AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(CAST(trunc((value - lo) / w * {Q_BINS}) AS BIGINT),
                             0), {Q_BINS - 1}) AS BIGINT) AS bin,
         count(*) AS n
  FROM events, bounds
  WHERE value IS NOT NULL AND NOT isnan(value) AND event_type IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM hist
),
qs AS (SELECT * FROM (VALUES (0.5, 'p50'), (0.9, 'p90'), (0.99, 'p99'))
       t(q, qname)),
picked AS (
  SELECT c.event_type, q.qname, c.bin, c.n, c.cum, c.total,
         q.q * (c.total - 1) AS rnk,
         row_number() OVER (PARTITION BY c.event_type, q.qname
                            ORDER BY c.bin) AS rn
  FROM cum c CROSS JOIN qs q
  WHERE c.cum > q.q * (c.total - 1) + 1e-9
),
est AS (
  SELECT p.event_type, p.qname,
         b.lo + (p.bin + LEAST((p.rnk - (p.cum - p.n)) / p.n, 1.0))
                * (b.w / {Q_BINS}) AS v
  FROM picked p, bounds b WHERE p.rn = 1
)
SELECT event_type,
       max(CASE WHEN qname = 'p50' THEN v END) AS p50,
       max(CASE WHEN qname = 'p90' THEN v END) AS p90,
       max(CASE WHEN qname = 'p99' THEN v END) AS p99
FROM est GROUP BY 1 ORDER BY 1
"""

def _bloom_users_sql() -> str:
    """Exact DuckDB mirror of q_bloom_users (SQL-gated since round 5).
    A Bloom filter's bit array is an ORDER-INDEPENDENT function of the
    inserted key set (OR of k splitmix64-derived bit positions per key), so
    unlike the float sketches it mirrors exactly: the probe bit j of user u
    is set iff ANY inserted key maps ANY of its k positions onto
    pos_j(u) — replicated as a semi-join against the distinct inserted
    position set, with bloom_hit = all {BLOOM_K} probe positions present.
    Mirrors numpy's u64 arithmetic via sqlhash (seeds inlined as
    (SEED * (j+1)) mod 2^64 literals)."""
    from .sqlhash import M64, splitmix64_ctes

    seeds = [(int(_BLOOM_SEED) * (j + 1)) % M64 for j in range(BLOOM_K)]
    seed_vals = ", ".join(f"({j}, {s}::HUGEINT)" for j, s in enumerate(seeds))
    p_sm, p_last = splitmix64_ctes("bp", "probe_src", ["u", "j"], "x", "h")
    i_sm, i_last = splitmix64_ctes("bi", "ins_src", ["e"], "x", "h")
    return f"""
WITH
users AS (SELECT DISTINCT user_id AS u FROM events),
purch AS (SELECT DISTINCT user_id AS e FROM events
          WHERE event_type = '{BLOOM_TARGET_TYPE}'),
seeds AS (SELECT * FROM (VALUES {seed_vals}) v(j, s)),
probe_src AS (SELECT u, j, xor(u::HUGEINT, s) AS x FROM users, seeds),
{p_sm},
ppos AS (SELECT u, j, h % {BLOOM_BITS} AS pos FROM {p_last}),
ins_src AS (SELECT e, xor(e::HUGEINT, s) AS x FROM purch, seeds),
{i_sm},
pset AS (SELECT DISTINCT h % {BLOOM_BITS} AS pos FROM {i_last}),
hits AS (
  SELECT u FROM (SELECT DISTINCT p.u, p.j
                 FROM ppos p JOIN pset s ON p.pos = s.pos) t
  GROUP BY u HAVING count(*) = {BLOOM_K})
SELECT u AS user_id,
       u IN (SELECT u FROM hits) AS bloom_hit,
       u IN (SELECT e FROM purch) AS true_hit
FROM users ORDER BY u
"""


def _cms_top_tokens_sql() -> str:
    """Exact DuckDB mirror of q_cms_top_tokens (SQL-gated since round 5).
    Count-Min is linear over integer counters, so the merged sketch is an
    order-independent function of the token-occurrence multiset: cell
    (d, pos) = SUM of occurrence counts over the word hashes landing
    there — replicated from the sqlhash word-hash CTE (occurrences per
    hash -> per-row cell positions -> grouped cells). The exact top-K side
    reuses the token tokenize/count/tie-break of text_top_tokens; each
    token's hash is recovered by joining the word string back to its
    hash on (doc_id, widx); est_n = MIN over the {CMS_D} probed cells."""
    from .sqlhash import M64, splitmix64_ctes, word_hash_ctes
    from .texthash import BYTE_BASE

    seeds = [(int(_CMS_SEED) * (d + 1)) % M64 for d in range(CMS_D)]
    seed_vals = ", ".join(f"({d}, {s}::HUGEINT)" for d, s in enumerate(seeds))
    wh_frag, wh_last = word_hash_ctes(int(BYTE_BASE))
    c_sm, c_last = splitmix64_ctes("cc", "cell_src", ["wh", "cnt", "d"], "x", "ch")
    t_sm, t_last = splitmix64_ctes(
        "tt", "top_src", ["token", "n", "rank", "d"], "x", "th"
    )
    return f"""
WITH RECURSIVE
{wh_frag},
occ AS (SELECT wh, count(*) AS cnt FROM {wh_last} GROUP BY 1),
dseeds AS (SELECT * FROM (VALUES {seed_vals}) v(d, s)),
cell_src AS (SELECT wh, cnt, d, xor(wh, s) AS x FROM occ, dseeds),
{c_sm},
cells AS (SELECT d, ch % {CMS_W} AS pos, SUM(cnt) AS cell
          FROM {c_last} GROUP BY 1, 2),
tw AS (SELECT w.word AS token, h.wh
       FROM words w JOIN {wh_last} h
         ON w.doc_id = h.doc_id AND w.widx = h.widx),
tc AS (SELECT token, min(wh) AS wh, count(*) AS n FROM tw GROUP BY token),
sel AS (SELECT * FROM (
    SELECT token, wh, n, row_number() OVER (ORDER BY n DESC, token) AS rank
    FROM tc) r WHERE rank <= {CMS_TOP_K}),
top_src AS (SELECT token, n, rank, d, xor(wh, s) AS x FROM sel, dseeds),
{t_sm}
SELECT t.rank, t.token, t.n, CAST(MIN(c.cell) AS BIGINT) AS est_n
FROM {t_last} t JOIN cells c ON c.d = t.d AND c.pos = (t.th % {CMS_W})
GROUP BY 1, 2, 3
ORDER BY t.rank
"""


# SQL-gated since round 5: Bloom bits and CMS counters are
# order-independent integer functions of the input multiset, so sqlhash
# mirrors them exactly. HLL and Misra-Gries stay rows-only for real
# reasons: HLL's estimate divides by a 4096-term float64 sum whose numpy
# pairwise-summation rounding DuckDB cannot replicate, and MG's counter
# set depends on block/merge order by design (only the GUARANTEES are
# order-free; both are pinned by dedicated pytest invariants).
register("sketch_bloom_users", q_bloom_users, _bloom_users_sql())
register("sketch_cms_top_tokens", q_cms_top_tokens, _cms_top_tokens_sql())
register("sketch_hll_distinct_users", q_hll_distinct_users)  # rows-only
register("sketch_value_quantiles", q_value_quantiles, _VALUE_QUANTILES_SQL)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — the deterministic mergeable frequency sketch
# (Agarwal et al., "Mergeable Summaries", PODS 2012): each block's exact
# counts reduce to <= MG_K counters by subtracting the (K+1)-th largest
# count; merging = sum counters by key, reduce again. Guarantees: est <=
# true, and true - est <= n_total / (MG_K + 1), so every user with true
# frequency above that bound SURVIVES the sketch. The exchange carries
# <= (MG_K + 1) x blocks rows (the +1 is a per-block total marker), never
# event rows — this is the sketch to reach for when CMS's hash collisions
# or its width x depth memory are the wrong trade.
# ---------------------------------------------------------------------------

MG_K = 64
MG_TOP = 10


def mg_reduce(keys: np.ndarray, counts: np.ndarray, k: int):
    """Reduce exact counters to <= k by the Misra-Gries decrement."""
    if len(keys) <= k:
        return keys, counts
    idx = np.argpartition(counts, -(k + 1))
    d = counts[idx[-(k + 1)]]
    c2 = counts - d
    m = c2 > 0
    return keys[m], c2[m]


def _mg_partial_batch(t):
    import pyarrow as pa

    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    u, c = np.unique(uid, return_counts=True)
    ku, kc = mg_reduce(u, c.astype(np.int64), MG_K)
    # user_id -1 is the per-block total marker (synth user ids are >= 0)
    return pa.table(
        {"user_id": pa.array(np.concatenate([ku, [-1]]), pa.int64()),
         "cnt": pa.array(np.concatenate([kc, [len(uid)]]), pa.int64())}
    )


def q_mg_heavy_users(sf_dir: str):
    """Top event-heavy users via the mergeable Misra-Gries sketch:
    (user_id, est_count, err_bound) — est <= true <= est + err_bound."""
    import os

    import pyarrow as pa
    import ray.data

    from ..rayenv import remote_kwargs

    df = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
        .map_batches(_mg_partial_batch, batch_format="pyarrow",
                     **remote_kwargs())
        .to_pandas()  # <= (MG_K + 1) x blocks rows
    )
    if len(df) == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "est_count": pa.array([], pa.int64()),
             "err_bound": pa.array([], pa.int64())}
        )
    total = int(df.loc[df["user_id"] == -1, "cnt"].sum())
    df = df[df["user_id"] >= 0]
    agg = df.groupby("user_id", as_index=False)["cnt"].sum()
    ku, kc = mg_reduce(
        agg["user_id"].to_numpy(np.int64), agg["cnt"].to_numpy(np.int64),
        MG_K,
    )
    bound = total // (MG_K + 1)
    order = np.lexsort((ku, -kc))[:MG_TOP]
    return pa.table(
        {"user_id": pa.array(ku[order], pa.int64()),
         "est_count": pa.array(kc[order], pa.int64()),
         "err_bound": pa.array(np.full(len(order), bound, np.int64),
                               pa.int64())}
    )


register("sketch_mg_heavy_users", q_mg_heavy_users)  # rows-only (sketch)
