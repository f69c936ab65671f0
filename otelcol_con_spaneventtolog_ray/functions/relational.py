"""Generic relational/analytics pipelines over the TPC-H-ish tables —
the engine is not only a telemetry/corpus tool; these exercise classic
columnar aggregation and broadcast-join shapes on `lineitem` / `orders` /
`customer` / `nation`.

* rel_pricing_summary — the TPC-H Q1 shape: pruned scan, per-batch PARTIAL
  aggregation (the combiner) so only |groups| x |blocks| rows reach the
  final tiny groupby. Money columns are folded as 100x / 10000x SCALED
  INTEGERS so distributed summation order cannot produce float drift vs
  the DuckDB mirror — exact value-hash parity at any block split. The
  shipdate cutoff runs as the combiner's first vectorized step, not at the
  read: Ray 2.49's read_parquet does not forward a scanner ``filter``
  through arrow_parquet_args (its fragment-sampling path rejects it —
  verified empirically with both timestamp and numeric predicates), so
  column pruning at the read + a first-map filter is the idiomatic form.
* rel_revenue_by_nation — the TPC-H Q5-lite shape: the small dimension
  side (customer ⋈ nation, |customers| rows) is broadcast ONCE via
  ray.put as sorted numpy arrays; the fact scan resolves nation per order
  with a vectorized searchsorted and emits integer-scaled partials. No
  shuffle ever carries fact rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from .relutil import _lookup_int, _q3_join_sentinels, _read  # noqa: F401
from ..rayenv import remote_kwargs

#: Q1-style cutoff (inclusive): inside the data's 1995-2001 span so the
#: filter actually prunes rows
PRICING_CUTOFF = "1999-12-31"


def _pricing_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (returnflag, linestatus) with
    integer-scaled sums. qty is integral (scale 1); price is 2dp (x100);
    disc_price = price * (1 - disc) is exact at x10000."""
    cutoff = np.datetime64(PRICING_CUTOFF)
    ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
    keep = ship <= cutoff
    if not keep.all():
        batch = batch.filter(pa.array(keep))
    if batch.num_rows == 0:
        return pa.table(
            {"l_returnflag": pa.array([], pa.string()),
             "l_linestatus": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "qty": pa.array([], pa.int64()),
             "price_c": pa.array([], pa.int64()),
             "disc_price_cc": pa.array([], pa.int64())}
        )
    qty = np.rint(
        batch.column("l_quantity").to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    price_c = np.rint(
        batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    disc_c = np.rint(
        batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    disc_price_cc = price_c * (100 - disc_c)  # scale 10000, exact ints
    rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False).astype(str)
    ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False).astype(str)
    # two-column group runs via lexsort boundaries (no concatenated key, so
    # multi-char values can never alias across the column split)
    order = np.lexsort((ls, rf))
    rf_s, ls_s = rf[order], ls[order]
    boundary = (rf_s[1:] != rf_s[:-1]) | (ls_s[1:] != ls_s[:-1])
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    return pa.table(
        {
            "l_returnflag": pa.array(rf_s[first], pa.string()),
            "l_linestatus": pa.array(ls_s[first], pa.string()),
            "n": pa.array(
                np.diff(np.append(first, len(rf_s))).astype(np.int64), pa.int64()
            ),
            "qty": pa.array(np.add.reduceat(qty[order], first), pa.int64()),
            "price_c": pa.array(np.add.reduceat(price_c[order], first), pa.int64()),
            "disc_price_cc": pa.array(
                np.add.reduceat(disc_price_cc[order], first), pa.int64()
            ),
        }
    )


def q_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    ).map_batches(_pricing_partials, batch_format="pyarrow", **remote_kwargs())
    df = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("n"), Sum("qty"), Sum("price_c"), Sum("disc_price_cc"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"l_returnflag": pa.array([], pa.string()),
             "l_linestatus": pa.array([], pa.string()),
             "count_order": pa.array([], pa.int64()),
             "sum_qty": pa.array([], pa.int64()),
             "sum_base_price": pa.array([], pa.float64()),
             "sum_disc_price": pa.array([], pa.float64()),
             "avg_qty": pa.array([], pa.float64())}
        )
    df = df.rename(columns={
        "sum(n)": "count_order", "sum(qty)": "sum_qty",
        "sum(price_c)": "price_c", "sum(disc_price_cc)": "disc_price_cc",
    })
    # one division per GROUP from exact integers -> identical to the mirror
    df["sum_base_price"] = (df["price_c"] / 100.0).round(6)
    df["sum_disc_price"] = (df["disc_price_cc"] / 10000.0).round(6)
    df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(6)
    df = df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["l_returnflag", "l_linestatus", "count_order", "sum_qty",
            "sum_base_price", "sum_disc_price", "avg_qty"]],
        preserve_index=False,
    )


_PRICING_SQL = f"""
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS disc_price_cc
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF} 00:00:00')
SELECT l_returnflag, l_linestatus,
       count(*) AS count_order,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       round(sum(price_c) / 100.0, 6) AS sum_base_price,
       round(sum(disc_price_cc) / 10000.0, 6) AS sum_disc_price,
       round(sum(qty) / CAST(count(*) AS DOUBLE), 6) AS avg_qty
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_revenue_by_nation(sf_dir: str):
    """Per-nation order count + total revenue: broadcast the dimension side
    (customer -> nation name, via nation), scan orders once."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ck, kind="stable")
    ck, cn = ck[order], cn[order]
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nn = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    norder = np.argsort(nk, kind="stable")
    nk, nn = nk[norder], nn[norder]
    dim_ref = ray.put((ck, cn, nk, nn))

    def partials(batch: pa.Table) -> pa.Table:
        ck, cn, nk, nn = ray.get(dim_ref)
        cust_k = (
            batch.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price_c = np.rint(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pos = np.searchsorted(ck, cust_k)
        ok = (pos < len(ck)) & (ck[np.minimum(pos, len(ck) - 1)] == cust_k)
        nation_key = cn[np.minimum(pos, len(ck) - 1)][ok]
        price_c = price_c[ok]
        if len(price_c) == 0:
            return pa.table(
                {"nation": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "revenue_c": pa.array([], pa.int64())}
            )
        npos = np.minimum(np.searchsorted(nk, nation_key), len(nk) - 1)
        names = nn[npos]
        s_order = np.argsort(names.astype(str), kind="stable")
        ns, ps = names[s_order], price_c[s_order]
        uniq, first = np.unique(ns.astype(str), return_index=True)
        return pa.table(
            {
                "nation": pa.array(ns[first], pa.string()),
                "n": pa.array(
                    np.diff(np.append(first, len(ns))).astype(np.int64),
                    pa.int64(),
                ),
                "revenue_c": pa.array(np.add.reduceat(ps, first), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    df = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("nation")
        .aggregate(Sum("n"), Sum("revenue_c"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"nation": pa.array([], pa.string()),
             "n_orders": pa.array([], pa.int64()),
             "revenue": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"sum(n)": "n_orders", "sum(revenue_c)": "rc"})
    df["revenue"] = (df["rc"] / 100.0).round(6)
    df = df.sort_values("nation").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["nation", "n_orders", "revenue"]], preserve_index=False
    )


_REVENUE_SQL = """
SELECT n.n_name AS nation, count(*) AS n_orders,
       round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 6)
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — the repo's first FACT-FACT hash-shuffle join. Unlike
# rel_revenue_by_nation (dimension broadcast), BOTH sides here are fact-scale
# (per-order revenue partials x open orders), so a broadcast is impossible at
# 100 TB; Ray 2.49's hash-partitioned ``Dataset.join`` is the idiomatic
# exchange. The lineitem side is pre-aggregated per orderkey INSIDE
# map_batches before the join, so the shuffle carries one row per
# (orderkey, block), never raw line items; the top-k after the join is a
# per-block partial fold, so the driver sees O(k x blocks) rows.

Q3_CUTOFF = "1998-07-01"
TOPK_ORDERS = 10
#: hash-join partition count — sized to this box; at cluster scale set to
#: O(total cores) so every aggregator holds ~1/N of the smaller side
Q3_JOIN_PARTITIONS = 8


def _q3_lineitem_partials(batch: pa.Table) -> pa.Table:
    """Per-block combiner: one row per orderkey with integer-scaled revenue
    sum over post-cutoff shipments (revenue = price * (1 - disc), exact at
    x10000)."""
    cutoff = np.datetime64(Q3_CUTOFF)
    ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
    keep = ship > cutoff
    if not keep.all():
        batch = batch.filter(pa.array(keep))
    if batch.num_rows == 0:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "rev_cc": pa.array([], pa.int64())}
        )
    okey = (
        batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    price_c = np.rint(
        batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    disc_c = np.rint(
        batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    rev_cc = price_c * (100 - disc_c)
    order = np.argsort(okey, kind="stable")
    ok_s = okey[order]
    first = np.flatnonzero(
        np.concatenate([[True], ok_s[1:] != ok_s[:-1]])
    )
    return pa.table(
        {
            "o_orderkey": pa.array(ok_s[first], pa.int64()),
            "rev_cc": pa.array(np.add.reduceat(rev_cc[order], first), pa.int64()),
        }
    )


def _q3_rev_schema(t: pa.Table) -> pa.Table:
    """The hash join requires every left block to carry the key column —
    retype the aggregate's schema-less empty partitions (blockutil)."""
    from .blockutil import retype_block

    return retype_block(
        t,
        {"o_orderkey": ("o_orderkey", pa.int64()),
         "rev_cc": ("rev_cc", pa.int64())},
    )


def _q3_orders_filter(batch: pa.Table) -> pa.Table:
    cutoff = np.datetime64(Q3_CUTOFF)
    od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(od < cutoff))


def _q3_topk_block(batch: pa.Table) -> pa.Table:
    """Per-block partial top-k by (revenue desc, orderkey asc) — only
    TOPK_ORDERS rows per block reach the driver fold. Drops the negative
    sentinel keys planted by _q3_join_sentinels."""
    batch = batch.filter(pc.greater_equal(batch.column("o_orderkey"), 0))
    df = batch.to_pandas().sort_values(
        ["rev_cc", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(TOPK_ORDERS)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_order_revenue_topk(sf_dir: str):
    """Top-K open orders by shipped revenue: lineitem partials
    (l_shipdate > cutoff, pre-aggregated per orderkey per block) hash-join
    orders (o_orderdate < cutoff) on orderkey, then per-block top-k and a
    tiny driver fold. Revenue folded as exact x10000 integers so distributed
    sum order cannot drift vs the DuckDB mirror."""
    from ray.data.aggregate import Sum

    rev = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(_q3_lineitem_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("o_orderkey")
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .map_batches(_q3_rev_schema, batch_format="pyarrow",
                     **remote_kwargs())
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(_q3_orders_filter, batch_format="pyarrow", **remote_kwargs())
    import ray.data

    sent = _q3_join_sentinels(Q3_JOIN_PARTITIONS)
    sdate = np.full(len(sent), np.datetime64("1970-01-01", "us"))
    rev = rev.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "rev_cc": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "o_orderdate": pa.array(sdate),
         "o_orderpriority": pa.array([""] * len(sent), pa.string())}
    )))
    joined = rev.join(
        orders, join_type="inner", num_partitions=Q3_JOIN_PARTITIONS,
        on=("o_orderkey",),
    )
    partials = joined.map_batches(
        _q3_topk_block, batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    if len(partials) == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "o_orderkey": pa.array([], pa.int64()),
             "orderdate_us": pa.array([], pa.int64()),
             "o_orderpriority": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    df = partials.sort_values(
        ["rev_cc", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(TOPK_ORDERS).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["orderdate_us"] = (
        df["o_orderdate"].astype("datetime64[us]").astype("int64")
    )
    df["revenue"] = (df["rev_cc"] / 10000.0).round(6)
    return pa.Table.from_pandas(
        df[["rank", "o_orderkey", "orderdate_us", "o_orderpriority",
            "revenue"]],
        preserve_index=False,
    )


_Q3_SQL = f"""
WITH r AS (
  SELECT l_orderkey AS o_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_cc
  FROM lineitem
  WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
  GROUP BY 1),
j AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority, r.rev_cc
  FROM r JOIN orders o ON r.o_orderkey = o.o_orderkey
  WHERE o.o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00')
SELECT row_number() OVER (ORDER BY rev_cc DESC, o_orderkey) AS rank,
       o_orderkey, epoch_us(o_orderdate) AS orderdate_us, o_orderpriority,
       round(rev_cc / 10000.0, 6) AS revenue
FROM j
ORDER BY rev_cc DESC, o_orderkey
LIMIT {TOPK_ORDERS}
"""


# ---------------------------------------------------------------------------
# Anti-join / semi-join — churn and returns analytics on Ray 2.49's native
# hash-partitioned ``left_anti`` / ``left_semi`` join types. Both sides are
# fact-scale at 100 TB (customers x orders / orders x lineitems), so the
# hash-shuffle join is the honest exchange; the probe side is pre-reduced to
# per-block DISTINCT keys inside map_batches so the shuffle carries one
# (key) row per block, never raw fact rows. The sentinel machinery from the
# Q3 join covers Ray's empty-hash-partition crash: sentinels are planted on
# BOTH sides, so the anti join drops them as matches and the semi join
# surfaces them for a vectorized ``key >= 0`` filter.

#: churn cutoff — customers with no order on/after this date count as churned
CHURN_CUTOFF = "2000-01-01"
ANTI_JOIN_PARTITIONS = 8


def _recent_order_keys(batch: pa.Table) -> pa.Table:
    """Per-block combiner for the probe side: distinct custkeys with an
    order on/after CHURN_CUTOFF — the only column that ever shuffles."""
    cutoff = np.datetime64(CHURN_CUTOFF)
    od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
    keys = (
        batch.column("o_custkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)[od >= cutoff]
    )
    return pa.table({"o_custkey": pa.array(np.unique(keys), pa.int64())})


def _churn_partials(batch: pa.Table) -> pa.Table:
    """Per-block (mktsegment, n, acctbal cents) partials over the anti-join
    survivors; drops the planted negative sentinel keys defensively (matched
    sentinels are already removed by the anti join itself)."""
    batch = batch.filter(pc.greater_equal(batch.column("c_custkey"), 0))
    if batch.num_rows == 0:
        return pa.table(
            {"c_mktsegment": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "bal_c": pa.array([], pa.int64())}
        )
    seg = (
        batch.column("c_mktsegment").to_numpy(zero_copy_only=False)
        .astype(str)
    )
    bal_c = np.rint(
        batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    order = np.argsort(seg, kind="stable")
    seg_s = seg[order]
    first = np.flatnonzero(np.concatenate([[True], seg_s[1:] != seg_s[:-1]]))
    return pa.table(
        {
            "c_mktsegment": pa.array(seg_s[first], pa.string()),
            "n": pa.array(
                np.diff(np.append(first, len(seg_s))).astype(np.int64),
                pa.int64(),
            ),
            "bal_c": pa.array(np.add.reduceat(bal_c[order], first), pa.int64()),
        }
    )


def q_churned_customers(sf_dir: str):
    """Churned customers (no order on/after CHURN_CUTOFF) per market
    segment: count + total account balance. Distributed LEFT ANTI hash join
    (customer ⟂ recent-order custkeys); money folded as exact cents."""
    import ray.data
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        _recent_order_keys, batch_format="pyarrow", **remote_kwargs()
    )
    sent = _q3_join_sentinels(ANTI_JOIN_PARTITIONS)
    cust = cust.union(ray.data.from_arrow(pa.table(
        {"c_custkey": pa.array(sent, pa.int64()),
         "c_mktsegment": pa.array([""] * len(sent), pa.string()),
         "c_acctbal": pa.array([0.0] * len(sent), pa.float64())}
    )))
    recent = recent.union(ray.data.from_arrow(pa.table(
        {"o_custkey": pa.array(sent, pa.int64())}
    )))
    churned = cust.join(
        recent, join_type="left_anti",
        num_partitions=ANTI_JOIN_PARTITIONS,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    df = (
        churned.map_batches(_churn_partials, batch_format="pyarrow",
                            **remote_kwargs())
        .groupby("c_mktsegment")
        .aggregate(Sum("n"), Sum("bal_c"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"c_mktsegment": pa.array([], pa.string()),
             "n_customers": pa.array([], pa.int64()),
             "total_acctbal": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"sum(n)": "n_customers", "sum(bal_c)": "bal_c"})
    df["total_acctbal"] = (df["bal_c"] / 100.0).round(6)
    df = df.sort_values("c_mktsegment").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["c_mktsegment", "n_customers", "total_acctbal"]],
        preserve_index=False,
    )


_CHURN_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 6)
         AS total_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '{CHURN_CUTOFF} 00:00:00')
GROUP BY 1 ORDER BY 1
"""


def _returned_order_keys(batch: pa.Table) -> pa.Table:
    """Probe-side combiner: distinct orderkeys with a returned line item."""
    flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
    keys = (
        batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)[flag == "R"]
    )
    return pa.table({"l_orderkey": pa.array(np.unique(keys), pa.int64())})


def _returns_partials(batch: pa.Table) -> pa.Table:
    """(orderpriority, n, totalprice cents) partials over semi-join
    survivors; drops the planted sentinels (a semi join KEEPS matched rows,
    so the negative keys come through and must be filtered)."""
    batch = batch.filter(pc.greater_equal(batch.column("o_orderkey"), 0))
    if batch.num_rows == 0:
        return pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "price_c": pa.array([], pa.int64())}
        )
    pri = (
        batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        .astype(str)
    )
    price_c = np.rint(
        batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    order = np.argsort(pri, kind="stable")
    pri_s = pri[order]
    first = np.flatnonzero(np.concatenate([[True], pri_s[1:] != pri_s[:-1]]))
    return pa.table(
        {
            "o_orderpriority": pa.array(pri_s[first], pa.string()),
            "n": pa.array(
                np.diff(np.append(first, len(pri_s))).astype(np.int64),
                pa.int64(),
            ),
            "price_c": pa.array(
                np.add.reduceat(price_c[order], first), pa.int64()
            ),
        }
    )


def q_orders_with_returns(sf_dir: str):
    """Orders containing at least one returned line item, rolled up by
    order priority (count + total order value). Distributed LEFT SEMI hash
    join — the lineitem probe side shuffles only per-block distinct
    orderkeys."""
    import ray.data
    from ray.data.aggregate import Sum

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    ret = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        _returned_order_keys, batch_format="pyarrow", **remote_kwargs()
    )
    sent = _q3_join_sentinels(ANTI_JOIN_PARTITIONS)
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "o_orderpriority": pa.array([""] * len(sent), pa.string()),
         "o_totalprice": pa.array([0.0] * len(sent), pa.float64())}
    )))
    ret = ret.union(ray.data.from_arrow(pa.table(
        {"l_orderkey": pa.array(sent, pa.int64())}
    )))
    kept = orders.join(
        ret, join_type="left_semi",
        num_partitions=ANTI_JOIN_PARTITIONS,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )
    df = (
        kept.map_batches(_returns_partials, batch_format="pyarrow",
                         **remote_kwargs())
        .groupby("o_orderpriority")
        .aggregate(Sum("n"), Sum("price_c"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n_orders": pa.array([], pa.int64()),
             "total_value": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"sum(n)": "n_orders", "sum(price_c)": "price_c"})
    df["total_value"] = (df["price_c"] / 100.0).round(6)
    df = df.sort_values("o_orderpriority").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["o_orderpriority", "n_orders", "total_value"]],
        preserve_index=False,
    )


_RETURNS_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 6)
         AS total_value
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — local-supply-chain revenue by nation: revenue from line
# items where the SUPPLIER's nation equals the ordering CUSTOMER's nation,
# restricted to one region and a date window. Composition of both join
# strategies: the small dimensions (supplier→nation, customer→nation,
# nation→name/region) broadcast ONCE via ray.put and resolve with
# vectorized searchsorted inside map_batches; the fact-fact orderkey
# equi-join (lineitem partials x filtered orders) is the hash-shuffle
# exchange, carrying pre-aggregated (orderkey, supp_nation, rev_cc) rows.

Q5_REGION = "ASIA"
Q5_DATE_FROM = "1997-01-01"
Q5_DATE_TO = "1999-01-01"  # exclusive


def _dim_lookup(sf_dir: str):
    """Broadcastable (sorted) dimension arrays: supplier→nationkey,
    customer→nationkey, nationkey→(name, in_region)."""
    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )

    def _sorted_pair(keys, vals):
        k = np.asarray(keys, dtype=np.int64)
        order = np.argsort(k, kind="stable")
        return k[order], vals[order]

    sk, sn = _sorted_pair(
        sup.column("s_suppkey").to_numpy(zero_copy_only=False),
        sup.column("s_nationkey").to_numpy(zero_copy_only=False)
        .astype(np.int64),
    )
    ck, cn = _sorted_pair(
        cust.column("c_custkey").to_numpy(zero_copy_only=False),
        cust.column("c_nationkey").to_numpy(zero_copy_only=False)
        .astype(np.int64),
    )
    region_keys = {
        rk: rn
        for rk, rn in zip(
            reg.column("r_regionkey").to_numpy(zero_copy_only=False),
            reg.column("r_name").to_pylist(),
        )
    }
    nk, nmeta = _sorted_pair(
        nat.column("n_nationkey").to_numpy(zero_copy_only=False),
        np.array(
            list(zip(
                nat.column("n_name").to_pylist(),
                [
                    region_keys.get(int(r)) == Q5_REGION
                    for r in nat.column("n_regionkey")
                    .to_numpy(zero_copy_only=False)
                ],
            )),
            dtype=object,
        ),
    )
    nname = np.array([m[0] for m in nmeta], dtype=object)
    in_region = np.array([bool(m[1]) for m in nmeta], dtype=bool)
    return sk, sn, ck, cn, nk, nname, in_region


def q_local_supply_revenue(sf_dir: str):
    """Q5-shape: revenue by nation where supplier nation == customer nation,
    region-restricted, over a 2-year order window."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    sk, sn, ck, cn, nk, nname, in_region = _dim_lookup(sf_dir)
    dim_ref = ray.put((sk, sn, ck, cn, nk, nname, in_region))

    def li_partials(batch: pa.Table) -> pa.Table:
        skk, snn, *_ = ray.get(dim_ref)
        okey = (
            batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        supk = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price_c = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100
        ).astype(np.int64)
        disc_c = np.rint(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rev_cc = price_c * (100 - disc_c)
        snat = _lookup_int(skk, snn, supk)
        ok = snat >= 0
        okey, snat, rev_cc = okey[ok], snat[ok], rev_cc[ok]
        if len(okey) == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "supp_nk": pa.array([], pa.int64()),
                 "rev_cc": pa.array([], pa.int64())}
            )
        order = np.lexsort((snat, okey))
        ok_s, sn_s = okey[order], snat[order]
        boundary = (ok_s[1:] != ok_s[:-1]) | (sn_s[1:] != sn_s[:-1])
        first = np.flatnonzero(np.concatenate([[True], boundary]))
        return pa.table(
            {
                "o_orderkey": pa.array(ok_s[first], pa.int64()),
                "supp_nk": pa.array(sn_s[first], pa.int64()),
                "rev_cc": pa.array(
                    np.add.reduceat(rev_cc[order], first), pa.int64()
                ),
            }
        )

    def orders_map(batch: pa.Table) -> pa.Table:
        _, _, ckk, cnn, *_ = ray.get(dim_ref)
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (od >= np.datetime64(Q5_DATE_FROM)) & (
            od < np.datetime64(Q5_DATE_TO)
        )
        okey = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        custk = (
            batch.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        cnat = _lookup_int(ckk, cnn, custk)
        ok = cnat >= 0
        return pa.table(
            {"o_orderkey": pa.array(okey[ok], pa.int64()),
             "cust_nk": pa.array(cnat[ok], pa.int64())}
        )

    def post_join_partials(batch: pa.Table) -> pa.Table:
        *_, nkk, nnm, in_reg = ray.get(dim_ref)
        okey = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        snat = (
            batch.column("supp_nk").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cnat = (
            batch.column("cust_nk").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        rev = (
            batch.column("rev_cc").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = (okey >= 0) & (snat == cnat) & (snat >= 0)
        snat, rev = snat[keep], rev[keep]
        if len(snat) > 0:
            pos = np.minimum(np.searchsorted(nkk, snat), len(nkk) - 1)
            valid = (nkk[pos] == snat) & in_reg[pos]
            pos, rev = pos[valid], rev[valid]
        else:
            pos = np.array([], dtype=np.int64)
        if len(pos) == 0:
            return pa.table(
                {"nation": pa.array([], pa.string()),
                 "rev_cc": pa.array([], pa.int64())}
            )
        names = nnm[pos].astype(str)
        order = np.argsort(names, kind="stable")
        nm_s, rv_s = names[order], rev[order]
        first = np.flatnonzero(np.concatenate([[True], nm_s[1:] != nm_s[:-1]]))
        return pa.table(
            {
                "nation": pa.array(nm_s[first], pa.string()),
                "rev_cc": pa.array(np.add.reduceat(rv_s, first), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partials, batch_format="pyarrow", **remote_kwargs())
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_map, batch_format="pyarrow", **remote_kwargs())

    sent = _q3_join_sentinels(Q3_JOIN_PARTITIONS)
    li = li.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "supp_nk": pa.array([-1] * len(sent), pa.int64()),
         "rev_cc": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "cust_nk": pa.array([-2] * len(sent), pa.int64())}
    )))
    joined = li.join(
        orders, join_type="inner", num_partitions=Q3_JOIN_PARTITIONS,
        on=("o_orderkey",),
    )
    from ray.data.aggregate import Sum as _Sum

    df = (
        joined.map_batches(post_join_partials, batch_format="pyarrow",
                           **remote_kwargs())
        .groupby("nation")
        .aggregate(_Sum("rev_cc"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"nation": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"sum(rev_cc)": "rev_cc"})
    df["revenue"] = (df["rev_cc"] / 10000.0).round(6)
    df = df.sort_values("nation").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["nation", "revenue"]], preserve_index=False
    )


_Q5_SQL = f"""
SELECT n.n_name AS nation,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             / 10000.0, 6) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_FROM} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q5_DATE_TO} 00:00:00'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# OLAP shapes — pivot and rollup. Both follow the "aggregate once at the
# finest grain, widen/derive on the tiny result" rule: the fact scan emits
# per-block integer partials at the finest (row, column) grain, ONE small
# groupby folds them, and the pivot/rollup reshaping happens on the driver
# over a bounded-cardinality table (|months| x |priorities| / |nations| x
# |years|) — never a second pass over the facts.

PIVOT_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
_PIVOT_COLS = [
    "p" + p.lower().replace("-", "_").replace(" ", "_")
    for p in PIVOT_PRIORITIES
]


def _pivot_partials(batch: pa.Table) -> pa.Table:
    """Per-block (months-since-epoch, priority, n) partial counts."""
    od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
    ym = od.astype("datetime64[M]").astype(np.int64)
    pri = (
        batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        .astype(str)
    )
    order = np.lexsort((pri, ym))
    ym_s, pri_s = ym[order], pri[order]
    boundary = (ym_s[1:] != ym_s[:-1]) | (pri_s[1:] != pri_s[:-1])
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    return pa.table(
        {
            "ym": pa.array(ym_s[first], pa.int64()),
            "pri": pa.array(pri_s[first], pa.string()),
            "n": pa.array(
                np.diff(np.append(first, len(ym_s))).astype(np.int64),
                pa.int64(),
            ),
        }
    )


def q_orders_pivot(sf_dir: str):
    """Order counts pivoted month x priority (wide columns, zeros filled) —
    the classic pivot-report shape."""
    from ray.data.aggregate import Sum

    df = (
        _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
        .map_batches(_pivot_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["ym", "pri"])
        .aggregate(Sum("n"))
        .to_pandas()
    )
    if len(df) == 0:
        cols = {"month": pa.array([], pa.string())}
        for c in _PIVOT_COLS:
            cols[c] = pa.array([], pa.int64())
        return pa.table(cols)
    wide = df.pivot_table(
        index="ym", columns="pri", values="sum(n)", fill_value=0,
        aggfunc="sum",
    )
    for p in PIVOT_PRIORITIES:
        if p not in wide.columns:
            wide[p] = 0
    wide = wide[PIVOT_PRIORITIES].astype(np.int64).reset_index()
    ym = wide["ym"].to_numpy(np.int64)
    month = np.array(
        [f"{1970 + m // 12:04d}-{m % 12 + 1:02d}" for m in ym], dtype=object
    )
    out = {"month": pa.array(month, pa.string())}
    for p, c in zip(PIVOT_PRIORITIES, _PIVOT_COLS):
        out[c] = pa.array(wide[p].to_numpy(np.int64), pa.int64())
    order = np.argsort(month.astype(str), kind="stable")
    return pa.table(out).take(pa.array(order))


_PIVOT_SQL = (
    "SELECT strftime(o_orderdate, '%Y-%m') AS month,\n"
    + ",\n".join(
        f"       count(*) FILTER (o_orderpriority = '{p}') AS {c}"
        for p, c in zip(PIVOT_PRIORITIES, _PIVOT_COLS)
    )
    + "\nFROM orders GROUP BY 1 ORDER BY 1"
)


def _rollup_partials_factory(dim_ref):
    import ray

    def partials(batch: pa.Table) -> pa.Table:
        ck, cn, nk, nn = ray.get(dim_ref)
        cust_k = (
            batch.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price_c = np.rint(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = 1970 + od.astype("datetime64[Y]").astype(np.int64)
        pos = np.minimum(np.searchsorted(ck, cust_k), len(ck) - 1)
        ok = ck[pos] == cust_k
        nat_key = cn[pos][ok]
        price_c, year = price_c[ok], year[ok]
        if len(price_c) == 0:
            return pa.table(
                {"nation": pa.array([], pa.string()),
                 "year": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "rc": pa.array([], pa.int64())}
            )
        npos = np.minimum(np.searchsorted(nk, nat_key), len(nk) - 1)
        names = nn[npos].astype(str)
        order = np.lexsort((year, names))
        nm_s, yr_s = names[order], year[order]
        boundary = (nm_s[1:] != nm_s[:-1]) | (yr_s[1:] != yr_s[:-1])
        first = np.flatnonzero(np.concatenate([[True], boundary]))
        pc_s = price_c[order]
        return pa.table(
            {
                "nation": pa.array(nm_s[first], pa.string()),
                "year": pa.array(yr_s[first], pa.int64()),
                "n": pa.array(
                    np.diff(np.append(first, len(nm_s))).astype(np.int64),
                    pa.int64(),
                ),
                "rc": pa.array(np.add.reduceat(pc_s, first), pa.int64()),
            }
        )

    return partials


def q_revenue_rollup(sf_dir: str):
    """ROLLUP(nation, year) order-revenue cube: finest grain aggregated
    distributed ONCE; the (nation) and grand-total levels derive from the
    tiny finest table on the driver. Rolled-up dimensions use explicit
    sentinels ('ALL' / 0) instead of SQL NULLs so the value-hash contract
    stays typed."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ck, kind="stable")
    ck, cn = ck[order], cn[order]
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nn = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    norder = np.argsort(nk, kind="stable")
    nk, nn = nk[norder], nn[norder]
    dim_ref = ray.put((ck, cn, nk, nn))

    df = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])
        .map_batches(_rollup_partials_factory(dim_ref),
                     batch_format="pyarrow", **remote_kwargs())
        .groupby(["nation", "year"])
        .aggregate(Sum("n"), Sum("rc"))
        .to_pandas()
    )
    empty = pa.table(
        {"lvl": pa.array([], pa.int64()),
         "nation": pa.array([], pa.string()),
         "year": pa.array([], pa.int64()),
         "n_orders": pa.array([], pa.int64()),
         "revenue": pa.array([], pa.float64())}
    )
    if len(df) == 0:
        return empty
    df = df.rename(columns={"sum(n)": "n", "sum(rc)": "rc"})
    fine = df[["nation", "year", "n", "rc"]].copy()
    fine["lvl"] = 2
    by_nation = (
        df.groupby("nation", as_index=False)[["n", "rc"]].sum()
    )
    by_nation["year"] = 0
    by_nation["lvl"] = 1
    total = {
        "lvl": [0], "nation": ["ALL"], "year": [0],
        "n": [int(df["n"].sum())], "rc": [int(df["rc"].sum())],
    }
    import pandas as pd

    allrows = pd.concat(
        [fine, by_nation, pd.DataFrame(total)], ignore_index=True
    )
    allrows["revenue"] = (allrows["rc"] / 100.0).round(6)
    allrows = allrows.rename(columns={"n": "n_orders"}).sort_values(
        ["lvl", "nation", "year"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(
        allrows[["lvl", "nation", "year", "n_orders", "revenue"]],
        preserve_index=False,
    )


_ROLLUP_SQL = """
WITH b AS (
  SELECT n.n_name AS nation,
         CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS year,
         count(*) AS n,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rc
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2)
SELECT 2 AS lvl, nation, year,
       CAST(n AS BIGINT) AS n_orders, round(rc / 100.0, 6) AS revenue
FROM b
UNION ALL
SELECT 1, nation, 0, CAST(sum(n) AS BIGINT), round(sum(rc) / 100.0, 6)
FROM b GROUP BY 2
UNION ALL
SELECT 0, 'ALL', 0, CAST(sum(n) AS BIGINT), round(sum(rc) / 100.0, 6)
FROM b
ORDER BY lvl, nation, year
"""


# ---------------------------------------------------------------------------
# TPC-H Q13-shape: customer order-count distribution — the repo's LEFT OUTER
# join (the fourth Ray 2.49 hash-join type after inner / left_anti /
# left_semi). Customers with NO orders must appear in the 0-orders bucket,
# which is exactly what an outer join expresses and an inner join cannot.
# Scale shape: orders are pre-aggregated to one (custkey, cnt) row per
# customer BEFORE the exchange (two-phase: per-block distinct partials →
# groupby Sum), so the join shuffles one row per customer per side, never
# raw fact rows; the joined rows collapse immediately into per-block
# (n_orders, n_customers) histogram partials and a tiny final groupby.
# ---------------------------------------------------------------------------

Q13_JOIN_PARTITIONS = 8


def _q13_order_count_partials(batch: pa.Table) -> pa.Table:
    """Per-block (o_custkey, cnt) partial order counts — the only rows the
    aggregate exchange carries."""
    if batch.num_rows == 0:
        return pa.table(
            {"o_custkey": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )
    keys = (
        batch.column("o_custkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    uniq, counts = np.unique(keys, return_counts=True)
    return pa.table(
        {"o_custkey": pa.array(uniq, pa.int64()),
         "cnt": pa.array(counts.astype(np.int64), pa.int64())}
    )


def _q13_cnt_schema(t: pa.Table) -> pa.Table:
    from .blockutil import retype_block

    return retype_block(
        t,
        {"o_custkey": ("o_custkey", pa.int64()),
         "cnt": ("cnt", pa.int64())},
    )


def _q13_hist_partials(batch: pa.Table) -> pa.Table:
    """Joined block → per-block (n_orders, n_customers) histogram partials.
    NULL cnt (customer matched no order row) IS the 0-orders bucket; the
    planted negative sentinel customers are dropped here."""
    if batch.num_rows == 0 or "c_custkey" not in batch.column_names:
        return pa.table(
            {"n_orders": pa.array([], pa.int64()),
             "n_cust": pa.array([], pa.int64())}
        )
    batch = batch.filter(pc.greater_equal(batch.column("c_custkey"), 0))
    if batch.num_rows == 0:
        return pa.table(
            {"n_orders": pa.array([], pa.int64()),
             "n_cust": pa.array([], pa.int64())}
        )
    cnt = (
        pc.fill_null(batch.column("cnt"), 0)
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )
    uniq, counts = np.unique(cnt, return_counts=True)
    return pa.table(
        {"n_orders": pa.array(uniq.astype(np.int64), pa.int64()),
         "n_cust": pa.array(counts.astype(np.int64), pa.int64())}
    )


def q_customer_order_distribution(sf_dir: str):
    """How many customers placed exactly N orders, for every N including 0
    (TPC-H Q13 shape). LEFT OUTER hash join of the customer key column
    against two-phase per-customer order counts; null-fill → 0 bucket;
    histogram folded as integer partials."""
    import ray.data
    from ray.data.aggregate import Sum

    counts = (
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(_q13_order_count_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("o_custkey")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(_q13_cnt_schema, batch_format="pyarrow",
                     **remote_kwargs())
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    sent = _q3_join_sentinels(Q13_JOIN_PARTITIONS)
    cust = cust.union(ray.data.from_arrow(pa.table(
        {"c_custkey": pa.array(sent, pa.int64())}
    )))
    counts = counts.union(ray.data.from_arrow(pa.table(
        {"o_custkey": pa.array(sent, pa.int64()),
         "cnt": pa.array([0] * len(sent), pa.int64())}
    )))
    joined = cust.join(
        counts, join_type="left_outer",
        num_partitions=Q13_JOIN_PARTITIONS,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    df = (
        joined.map_batches(_q13_hist_partials, batch_format="pyarrow",
                           **remote_kwargs())
        .groupby("n_orders")
        .aggregate(Sum("n_cust", alias_name="n_customers"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"n_orders": pa.array([], pa.int64()),
             "n_customers": pa.array([], pa.int64())}
        )
    df = df.sort_values("n_orders").reset_index(drop=True)
    df["n_orders"] = df["n_orders"].astype(np.int64)
    df["n_customers"] = df["n_customers"].astype(np.int64)
    return pa.Table.from_pandas(
        df[["n_orders", "n_customers"]], preserve_index=False
    )


_Q13_SQL = """
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM (
  SELECT c.c_custkey, CAST(COALESCE(oc.cnt, 0) AS BIGINT) AS n_orders
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) oc
  ON c.c_custkey = oc.o_custkey) t
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — promo revenue share per ship month. The join to `part`
# is a BROADCAST MEMBERSHIP test, not an exchange: the promo partkeys (one
# sorted int64 array, |promo parts| entries) ship once via ray.put and every
# lineitem block resolves `is_promo` with a vectorized searchsorted. The
# fact scan emits one (month, promo_cc, total_cc, n) partial row per block —
# a ratio-of-sums aggregate where BOTH sums fold as exact x10000 integers,
# so the final one-division-per-month share cannot drift vs the mirror.
# ---------------------------------------------------------------------------


def q_promo_revenue(sf_dir: str):
    """Monthly promo-vs-total revenue share (TPC-H Q14 shape): broadcast
    promo-part membership, integer-scaled ratio-of-sums partials."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    promo = np.sort(
        part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)[
            part.column("p_type").to_numpy(zero_copy_only=False) == "PROMO"
        ]
    )
    promo_ref = ray.put(promo)

    def partials(batch: pa.Table) -> pa.Table:
        promo = ray.get(promo_ref)
        if batch.num_rows == 0:
            return pa.table(
                {"ym": pa.array([], pa.int64()),
                 "promo_cc": pa.array([], pa.int64()),
                 "total_cc": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        pk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        ym = ship.astype("datetime64[M]").astype(np.int64)
        price_c = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rev_cc = price_c * (100 - disc_c)
        if len(promo):
            pos = np.minimum(np.searchsorted(promo, pk), len(promo) - 1)
            is_promo = promo[pos] == pk
        else:
            is_promo = np.zeros(len(pk), dtype=bool)
        order = np.argsort(ym, kind="stable")
        ym_s = ym[order]
        first = np.flatnonzero(np.concatenate([[True], ym_s[1:] != ym_s[:-1]]))
        return pa.table(
            {
                "ym": pa.array(ym_s[first], pa.int64()),
                "promo_cc": pa.array(
                    np.add.reduceat(
                        np.where(is_promo, rev_cc, 0)[order], first
                    ),
                    pa.int64(),
                ),
                "total_cc": pa.array(
                    np.add.reduceat(rev_cc[order], first), pa.int64()
                ),
                "n": pa.array(
                    np.diff(np.append(first, len(ym_s))).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    df = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("ym")
        .aggregate(Sum("promo_cc"), Sum("total_cc"), Sum("n"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"month": pa.array([], pa.string()),
             "n_items": pa.array([], pa.int64()),
             "promo_revenue": pa.array([], pa.float64()),
             "total_revenue": pa.array([], pa.float64()),
             "promo_share": pa.array([], pa.float64())}
        )
    df = df.rename(columns={
        "sum(promo_cc)": "promo_cc", "sum(total_cc)": "total_cc",
        "sum(n)": "n_items",
    })
    ym = df["ym"].to_numpy(np.int64)
    df["month"] = [f"{1970 + m // 12:04d}-{m % 12 + 1:02d}" for m in ym]
    df["promo_revenue"] = (df["promo_cc"] / 10000.0).round(6)
    df["total_revenue"] = (df["total_cc"] / 10000.0).round(6)
    df["promo_share"] = (df["promo_cc"] / df["total_cc"]).round(6)
    df = df.sort_values("month").reset_index(drop=True)
    df["n_items"] = df["n_items"].astype(np.int64)
    return pa.Table.from_pandas(
        df[["month", "n_items", "promo_revenue", "total_revenue",
            "promo_share"]],
        preserve_index=False,
    )


_Q14_SQL = """
WITH s AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_cc,
         (p.p_type = 'PROMO') AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
SELECT month, count(*) AS n_items,
       round(COALESCE(sum(rev_cc) FILTER (is_promo), 0) / 10000.0, 6)
         AS promo_revenue,
       round(sum(rev_cc) / 10000.0, 6) AS total_revenue,
       round(COALESCE(sum(rev_cc) FILTER (is_promo), 0)
             / CAST(sum(rev_cc) AS DOUBLE), 6) AS promo_share
FROM s GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier(s) by shipped revenue in a window, WITH
# ties. The argmax runs distributed: two-phase per-supplier integer revenue
# (per-block partials -> one small groupby keyed by suppkey), then the
# global max folds as a second TINY aggregate over the per-supplier table
# (one row per supplier — never fact rows), broadcast back as a scalar, and
# the equality filter + name attach run vectorized per block. The driver
# only ever sees the tied winners.
# ---------------------------------------------------------------------------

Q15_DATE_FROM = "1998-01-01"
Q15_DATE_TO = "1998-07-01"  # exclusive


def _q15_supp_partials(batch: pa.Table) -> pa.Table:
    """Per-block (suppkey, rev_cc) partials over the ship-date window."""
    ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
    keep = (ship >= np.datetime64(Q15_DATE_FROM)) & (
        ship < np.datetime64(Q15_DATE_TO)
    )
    if not keep.all():
        batch = batch.filter(pa.array(keep))
    if batch.num_rows == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "rev_cc": pa.array([], pa.int64())}
        )
    supk = (
        batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    price_c = np.rint(
        batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    disc_c = np.rint(
        batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    rev_cc = price_c * (100 - disc_c)
    order = np.argsort(supk, kind="stable")
    sk_s = supk[order]
    first = np.flatnonzero(np.concatenate([[True], sk_s[1:] != sk_s[:-1]]))
    return pa.table(
        {
            "s_suppkey": pa.array(sk_s[first], pa.int64()),
            "rev_cc": pa.array(np.add.reduceat(rev_cc[order], first), pa.int64()),
        }
    )


def q_top_suppliers(sf_dir: str):
    """Supplier(s) with the maximum shipped revenue in the Q15 window,
    ties included; distributed argmax over two-phase integer partials."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum
    from .blockutil import retype_block

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sn = np.asarray(sup.column("s_name").to_pylist(), dtype=object)
    order = np.argsort(sk, kind="stable")
    name_ref = ray.put((sk[order], sn[order]))

    per_supp = (
        _read(sf_dir, "lineitem",
              ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(_q15_supp_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("s_suppkey")
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"s_suppkey": ("s_suppkey", pa.int64()),
                 "rev_cc": ("rev_cc", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
    ).materialize()  # one row per supplier — tiny; reused for max + filter
    if per_supp.count() == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "total_revenue": pa.array([], pa.float64())}
        )
    best = per_supp.max("rev_cc")

    def winners(t: pa.Table) -> pa.Table:
        skk, snn = ray.get(name_ref)
        key = t.column("s_suppkey").to_numpy(zero_copy_only=False)
        rev = t.column("rev_cc").to_numpy(zero_copy_only=False)
        keep = rev == best
        key, rev = key[keep], rev[keep]
        pos = np.minimum(np.searchsorted(skk, key), max(len(skk) - 1, 0))
        names = (
            snn[pos].astype(str)
            if len(skk)
            else np.array([], dtype=object)
        )
        return pa.table(
            {
                "s_suppkey": pa.array(key, pa.int64()),
                "s_name": pa.array(names, pa.string()),
                "total_revenue": pa.array(
                    np.round(rev / 10000.0, 6), pa.float64()
                ),
            }
        )

    df = (
        per_supp.map_batches(winners, batch_format="pyarrow",
                             **remote_kwargs())
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


_Q15_SQL = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_cc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_DATE_FROM} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q15_DATE_TO} 00:00:00'
  GROUP BY 1)
SELECT r.s_suppkey, s.s_name, round(r.rev_cc / 10000.0, 6) AS total_revenue
FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.rev_cc = (SELECT max(rev_cc) FROM r)
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders: orders whose total line-item
# quantity exceeds a threshold, with the ordering customer's name attached.
# The only exchange is the per-order quantity aggregate, pre-reduced to one
# (orderkey, qty) row per block; the HAVING filter runs vectorized per
# result block, so the survivors (a tiny, selectivity-bounded set — the
# whole point of the query) are the only rows that ever reach the driver,
# and they broadcast back via ray.put for a searchsorted membership probe
# over the orders scan. Customer names attach from the same broadcast
# pattern as Q5's dimension lookup — fact rows never shuffle.
# ---------------------------------------------------------------------------

BIG_ORDER_QTY = 250  # HAVING threshold: ~1-2% of orders in the synth data


def _order_qty_partials(batch: pa.Table) -> pa.Table:
    """Per-block (orderkey, qty) integer partials — the groupby combiner."""
    if batch.num_rows == 0:
        return pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "qty": pa.array([], pa.int64())}
        )
    ok = (
        batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    qty = np.rint(
        batch.column("l_quantity").to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    order = np.argsort(ok, kind="stable")
    ok_s = ok[order]
    first = np.flatnonzero(np.concatenate([[True], ok_s[1:] != ok_s[:-1]]))
    return pa.table(
        {
            "l_orderkey": pa.array(ok_s[first], pa.int64()),
            "qty": pa.array(np.add.reduceat(qty[order], first), pa.int64()),
        }
    )


def q_big_orders(sf_dir: str):
    """Orders with total quantity > BIG_ORDER_QTY (TPC-H Q18 shape):
    per-block combiner -> ONE sort on orderkey -> boundary-safe segment-sum
    fold with the HAVING applied inside the fold (only survivors + the
    block-count-bounded boundary side-channel reach the driver), then the
    broadcast-probe attach. The sort replaces Ray's hash Aggregate, which
    measured ~4x slower on the same partial rows (see the Q21 rework)."""
    import pyarrow.parquet as pq
    import ray

    def _fold(t: pa.Table) -> pa.Table:
        """Sorted block -> interior segment sums filtered by the HAVING
        (boundary=0) + raw first/last-segment rows (boundary=1) for the
        exactly-once driver fold across Ray's sorted-block re-splits."""
        if t.num_rows == 0:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "qty": pa.array([], pa.int64()),
                 "boundary": pa.array([], pa.int64())}
            )
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = t.column("qty").to_numpy(zero_copy_only=False)
        seg = np.flatnonzero(np.concatenate([[True], ok[1:] != ok[:-1]]))
        lo = seg[1] if len(seg) > 1 else len(ok)
        hi = seg[-1] if len(seg) > 2 else lo
        side = np.concatenate([np.arange(0, lo), np.arange(hi, len(ok))])
        keys = [ok[side]]
        qtys = [q[side]]
        bnd = [np.ones(len(side), np.int64)]
        if len(seg) > 2:
            sums = np.add.reduceat(q, seg)[1:-1]
            kk = ok[seg[1:-1]]
            m = sums > BIG_ORDER_QTY
            keys.append(kk[m])
            qtys.append(sums[m])
            bnd.append(np.zeros(int(m.sum()), np.int64))
        return pa.table(
            {"l_orderkey": pa.array(np.concatenate(keys), pa.int64()),
             "qty": pa.array(np.concatenate(qtys), pa.int64()),
             "boundary": pa.array(np.concatenate(bnd), pa.int64())}
        )

    empty = pa.table(
        {"c_name": pa.array([], pa.string()),
         "c_custkey": pa.array([], pa.int64()),
         "o_orderkey": pa.array([], pa.int64()),
         "o_orderdate": pa.array([], pa.string()),
         "o_totalprice": pa.array([], pa.float64()),
         "total_qty": pa.array([], pa.int64())}
    )
    folded = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(_order_qty_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .sort("l_orderkey")
        .map_batches(_fold, batch_format="pyarrow", batch_size=None,
                     **remote_kwargs())
        .to_pandas()  # survivors + block-bounded side rows, never fact-scale
    )
    if len(folded):
        side = folded[folded["boundary"] == 1]
        big = folded[folded["boundary"] == 0][["l_orderkey", "qty"]]
        if len(side):
            ssum = side.groupby("l_orderkey", as_index=False)["qty"].sum()
            ssum = ssum[ssum["qty"] > BIG_ORDER_QTY]
            import pandas as pd

            big = pd.concat([big, ssum], ignore_index=True)
    else:
        big = folded
    if len(big) == 0:
        return empty
    bk = big["l_orderkey"].to_numpy(np.int64)
    bq = big["qty"].to_numpy(np.int64)
    order = np.argsort(bk, kind="stable")
    big_ref = ray.put((bk[order], bq[order]))

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = np.asarray(cust.column("c_name").to_pylist(), dtype=object)
    corder = np.argsort(ck, kind="stable")
    cust_ref = ray.put((ck[corder], cn[corder]))

    def attach(batch: pa.Table) -> pa.Table:
        bkk, bqq = ray.get(big_ref)
        okey = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pos = np.minimum(np.searchsorted(bkk, okey), len(bkk) - 1)
        hit = bkk[pos] == okey
        if not hit.any():
            return empty
        batch = batch.filter(pa.array(hit))
        qty = bqq[pos[hit]]
        ckk, cnn = ray.get(cust_ref)
        custk = (
            batch.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cpos = np.minimum(np.searchsorted(ckk, custk), max(len(ckk) - 1, 0))
        names = cnn[cpos].astype(str) if len(ckk) else np.array([], dtype=str)
        odate = (
            batch.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(str)
        )
        return pa.table(
            {
                "c_name": pa.array(names, pa.string()),
                "c_custkey": pa.array(custk, pa.int64()),
                "o_orderkey": pa.array(
                    batch.column("o_orderkey").to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
                "o_orderdate": pa.array(odate, pa.string()),
                "o_totalprice": pa.array(
                    batch.column("o_totalprice")
                    .to_numpy(zero_copy_only=False).astype(np.float64),
                    pa.float64(),
                ),
                "total_qty": pa.array(qty, pa.int64()),
            }
        )

    df = (
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {BIG_ORDER_QTY})
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice, big.total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — "idle rich" customers: balance above the positive-
# balance average (the global scalar subquery) with no RECENT order (the
# anti-join). The scalar folds distributed as one (sum_cents, n) row per
# block — the comparison then runs as exact integer cross-multiplication
# (bal_c * n > sum_c) on both engines, so no float average can drift. The
# balance filter runs BEFORE the anti join (smaller build side); the probe
# side reuses the churn combiner's distinct-recent-custkeys reduction, and
# the join itself is the same sentinel-guarded left_anti as churn.
# ---------------------------------------------------------------------------

IDLE_CUTOFF = CHURN_CUTOFF  # no order on/after this date counts as idle


def _posbal_partials(batch: pa.Table) -> pa.Table:
    """One (sum_cents, n) row per block over positive balances."""
    bal_c = np.rint(
        batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    pos = bal_c[bal_c > 0]
    return pa.table(
        {"s": pa.array([int(pos.sum())], pa.int64()),
         "n": pa.array([len(pos)], pa.int64())}
    )


def q_idle_rich_customers(sf_dir: str):
    """Customers above the positive-balance average with no order on/after
    IDLE_CUTOFF, rolled up per nation (TPC-H Q22 shape)."""
    import ray.data
    from ray.data.aggregate import Sum

    st = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(_posbal_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .to_pandas()  # one row per block
    )
    s, n = int(st["s"].sum()), int(st["n"].sum())

    def rich(t: pa.Table) -> pa.Table:
        bal_c = np.rint(
            t.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return t.filter(pa.array(bal_c * n > s))

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(rich, batch_format="pyarrow", **remote_kwargs())
    )
    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        _recent_order_keys, batch_format="pyarrow", **remote_kwargs()
    )
    sent = _q3_join_sentinels(ANTI_JOIN_PARTITIONS)
    cust = cust.union(ray.data.from_arrow(pa.table(
        {"c_custkey": pa.array(sent, pa.int64()),
         "c_nationkey": pa.array([0] * len(sent), pa.int64()),
         "c_acctbal": pa.array([0.0] * len(sent), pa.float64())}
    )))
    recent = recent.union(ray.data.from_arrow(pa.table(
        {"o_custkey": pa.array(sent, pa.int64())}
    )))
    idle = cust.join(
        recent, join_type="left_anti",
        num_partitions=ANTI_JOIN_PARTITIONS,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("c_custkey"), 0))
        if t.num_rows == 0:
            return pa.table(
                {"c_nationkey": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "bal_c": pa.array([], pa.int64())}
            )
        nk = (
            t.column("c_nationkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bal_c = np.rint(
            t.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.argsort(nk, kind="stable")
        nk_s = nk[order]
        first = np.flatnonzero(np.concatenate([[True], nk_s[1:] != nk_s[:-1]]))
        return pa.table(
            {
                "c_nationkey": pa.array(nk_s[first], pa.int64()),
                "n": pa.array(
                    np.diff(np.append(first, len(nk_s))).astype(np.int64),
                    pa.int64(),
                ),
                "bal_c": pa.array(
                    np.add.reduceat(bal_c[order], first), pa.int64()
                ),
            }
        )

    df = (
        idle.map_batches(partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("c_nationkey")
        .aggregate(Sum("n"), Sum("bal_c"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"c_nationkey": pa.array([], pa.int64()),
             "n_customers": pa.array([], pa.int64()),
             "total_acctbal": pa.array([], pa.float64())}
        )
    df = df.rename(columns={"sum(n)": "n_customers", "sum(bal_c)": "bal_c"})
    df["total_acctbal"] = (df["bal_c"] / 100.0).round(6)
    df["c_nationkey"] = df["c_nationkey"].astype(np.int64)
    df["n_customers"] = df["n_customers"].astype(np.int64)
    df = df.sort_values("c_nationkey").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["c_nationkey", "n_customers", "total_acctbal"]],
        preserve_index=False,
    )


_Q22_SQL = f"""
WITH stats AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s, count(*) AS n
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS n_customers,
       round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 6)
         AS total_acctbal
FROM customer c, stats
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * stats.n > stats.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF} 00:00:00')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — distinct supplier count per part type over shipped line
# items. COUNT(DISTINCT) at fact scale: the part→type mapping broadcasts
# once as (sorted partkeys, int8 type codes) — the |part| dimension is
# ~1/30th of |lineitem| in TPC-H and ships as two flat arrays, not a
# shuffle — and each lineitem block reduces to its DISTINCT (code, suppkey)
# pairs before the exchange, so the groupby dedupe carries at most
# |types| x |suppliers| x blocks rows. The final per-type count is a
# second tiny two-phase fold over the deduped pair table.
# ---------------------------------------------------------------------------


def q_part_type_suppliers(sf_dir: str):
    """Distinct suppliers shipping each part type (TPC-H Q16 shape):
    broadcast part→type codes, per-block distinct pairs, two-phase count."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Sum

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    ptype = np.asarray(part.column("p_type").to_pylist(), dtype=object)
    vocab, codes = np.unique(ptype.astype(str), return_inverse=True)
    order = np.argsort(pk, kind="stable")
    map_ref = ray.put((pk[order], codes[order].astype(np.int64)))

    def pair_partials(batch: pa.Table) -> pa.Table:
        pkk, cds = ray.get(map_ref)
        lp = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ls = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = _lookup_int(pkk, cds, lp)
        keep = code >= 0  # drop lineitems whose part is missing (none in synth)
        code, ls = code[keep], ls[keep]
        if len(code) == 0:
            return pa.table(
                {"code": pa.array([], pa.int64()),
                 "l_suppkey": pa.array([], pa.int64())}
            )
        # distinct (code, suppkey) pairs via one composite sort: suppkey is
        # non-negative int64 and |types| is tiny, so code * 2^48 + suppkey
        # cannot collide
        comp = np.unique(code * (1 << 48) + ls)
        return pa.table(
            {
                "code": pa.array(comp >> 48, pa.int64()),
                "l_suppkey": pa.array(comp & ((1 << 48) - 1), pa.int64()),
            }
        )

    def per_code(t: pa.Table) -> pa.Table:
        code = t.column("code").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(code) == 0:
            return pa.table(
                {"code": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        u, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {"code": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    df = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pair_partials, batch_format="pyarrow", **remote_kwargs())
        .groupby(["code", "l_suppkey"])
        .aggregate(Count())  # global pair dedupe; the count itself is unused
        .map_batches(per_code, batch_format="pyarrow", **remote_kwargs())
        .groupby("code")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"p_type": pa.array([], pa.string()),
             "n_suppliers": pa.array([], pa.int64())}
        )
    df["p_type"] = vocab[df["code"].to_numpy(np.int64)]
    df["n_suppliers"] = df["n"].astype(np.int64)
    df = df.sort_values("p_type").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["p_type", "n_suppliers"]], preserve_index=False
    )


_Q16_SQL = """
SELECT p.p_type, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — forecast revenue: ONE global scalar over a banded filter,
# the degenerate-but-canonical no-groupby aggregate. Zero exchange: every
# block reduces to a single (n, rev) partial row and the driver folds the
# O(blocks) partials. The discount band compares on exact CENTS (the float
# literal 0.05/0.07 is not representable; round-to-cents is the shared
# integer contract with the mirror), and revenue = price x discount folds
# as exact x10000 integers.
# ---------------------------------------------------------------------------

Q6_YEAR_FROM = "1998-01-01"
Q6_YEAR_TO = "1999-01-01"  # exclusive
Q6_DISC_LO_C = 5  # cents: 0.05..0.07 inclusive
Q6_DISC_HI_C = 7
Q6_QTY_MAX = 24  # exclusive


def _q6_partials(batch: pa.Table) -> pa.Table:
    ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
    qty = np.rint(
        batch.column("l_quantity").to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    disc_c = np.rint(
        batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    price_c = np.rint(
        batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    keep = (
        (ship >= np.datetime64(Q6_YEAR_FROM))
        & (ship < np.datetime64(Q6_YEAR_TO))
        & (disc_c >= Q6_DISC_LO_C)
        & (disc_c <= Q6_DISC_HI_C)
        & (qty < Q6_QTY_MAX)
    )
    return pa.table(
        {"n": pa.array([int(keep.sum())], pa.int64()),
         "rev_cc": pa.array(
             [int((price_c[keep] * disc_c[keep]).sum())], pa.int64()
         )}
    )


def q_forecast_revenue(sf_dir: str):
    """Revenue increase from dropping small discounts (TPC-H Q6 shape):
    zero-exchange global aggregate, one partial row per block."""
    df = (
        _read(sf_dir, "lineitem",
              ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"])
        .map_batches(_q6_partials, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()  # O(blocks) one-row partials
    )
    return pa.table(
        {"n_items": pa.array([int(df["n"].sum())], pa.int64()),
         "revenue": pa.array(
             [round(int(df["rev_cc"].sum()) / 10000.0, 6)], pa.float64()
         )}
    )


_Q6_SQL = f"""
SELECT count(*) FILTER (keep) AS n_items,
       round(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(round(l_discount * 100) AS BIGINT))
                      FILTER (keep), 0) / 10000.0, 6) AS revenue
FROM (
  SELECT l_extendedprice, l_discount,
         l_shipdate >= TIMESTAMP '{Q6_YEAR_FROM} 00:00:00'
         AND l_shipdate < TIMESTAMP '{Q6_YEAR_TO} 00:00:00'
         AND CAST(round(l_discount * 100) AS BIGINT)
               BETWEEN {Q6_DISC_LO_C} AND {Q6_DISC_HI_C}
         AND CAST(round(l_quantity) AS BIGINT) < {Q6_QTY_MAX} AS keep
  FROM lineitem)
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item losses: top customers by revenue of
# R-flagged line items for orders placed in one quarter. Composition on top
# of the Q3 machinery: R-filtered lineitem partials hash-join the
# quarter-filtered orders (the fact-fact exchange, sentinel-guarded), the
# joined rows re-aggregate per CUSTOMER (second small exchange keyed on
# custkey), and the top-k is a per-block partial fold; customer name and
# nation attach from broadcast arrays on the final k rows only.
# ---------------------------------------------------------------------------

Q10_DATE_FROM = "1998-01-01"
Q10_DATE_TO = "1998-04-01"  # exclusive
TOPK_CUSTOMERS = 20


def _q10_lineitem_partials(batch: pa.Table) -> pa.Table:
    """Per-block (orderkey, rev_cc) over RETURNED line items only."""
    flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
    keep = flag == "R"
    if not keep.all():
        batch = batch.filter(pa.array(keep))
    if batch.num_rows == 0:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "rev_cc": pa.array([], pa.int64())}
        )
    okey = (
        batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    price_c = np.rint(
        batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    disc_c = np.rint(
        batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    rev_cc = price_c * (100 - disc_c)
    order = np.argsort(okey, kind="stable")
    ok_s = okey[order]
    first = np.flatnonzero(np.concatenate([[True], ok_s[1:] != ok_s[:-1]]))
    return pa.table(
        {
            "o_orderkey": pa.array(ok_s[first], pa.int64()),
            "rev_cc": pa.array(np.add.reduceat(rev_cc[order], first), pa.int64()),
        }
    )


def q_returned_item_losses(sf_dir: str):
    """Top customers by returned-item revenue in the Q10 quarter:
    sentinel-guarded fact-fact join, per-customer re-aggregate, partial
    top-k, broadcast name/nation attach on the final rows."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum
    from .blockutil import retype_block

    rev = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])
        .map_batches(_q10_lineitem_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("o_orderkey")
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .map_batches(_q3_rev_schema, batch_format="pyarrow",
                     **remote_kwargs())
    )

    def orders_filter(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (od >= np.datetime64(Q10_DATE_FROM)) & (
            od < np.datetime64(Q10_DATE_TO)
        )
        return batch.filter(pa.array(keep))

    orders = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(orders_filter, batch_format="pyarrow", **remote_kwargs())
        .select_columns(["o_orderkey", "o_custkey"])
    )
    sent = _q3_join_sentinels(Q3_JOIN_PARTITIONS)
    rev = rev.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "rev_cc": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "o_custkey": pa.array(sent, pa.int64())}  # negative: dropped below
    )))
    joined = rev.join(
        orders, join_type="inner", num_partitions=Q3_JOIN_PARTITIONS,
        on=("o_orderkey",),
    )

    def per_cust_partials(t: pa.Table) -> pa.Table:
        ck = (
            t.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        rc = t.column("rev_cc").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ck >= 0  # sentinel rows out
        ck, rc = ck[keep], rc[keep]
        if len(ck) == 0:
            return pa.table(
                {"c_custkey": pa.array([], pa.int64()),
                 "rev_cc": pa.array([], pa.int64())}
            )
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        first = np.flatnonzero(np.concatenate([[True], ck_s[1:] != ck_s[:-1]]))
        return pa.table(
            {
                "c_custkey": pa.array(ck_s[first], pa.int64()),
                "rev_cc": pa.array(np.add.reduceat(rc[order], first), pa.int64()),
            }
        )

    def topk_block(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["rev_cc", "c_custkey"], ascending=[False, True], kind="stable"
        ).head(TOPK_CUSTOMERS)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = (
        joined.map_batches(per_cust_partials, batch_format="pyarrow",
                           **remote_kwargs())
        .groupby("c_custkey")
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"c_custkey": ("c_custkey", pa.int64()),
                 "rev_cc": ("rev_cc", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .map_batches(topk_block, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    if len(partials) == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "n_name": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    df = partials.sort_values(
        ["rev_cc", "c_custkey"], ascending=[False, True], kind="stable"
    ).head(TOPK_CUSTOMERS).reset_index(drop=True)
    # name/nation attach on the final k rows only — driver-side lookup is
    # O(k log |customer|), no distributed work touches the dimension
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ck, kind="stable")
    ck_s = ck[order]
    cname = np.asarray(cust.column("c_name").to_pylist(), dtype=object)[order]
    cnat = (
        cust.column("c_nationkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)[order]
    )
    nmap = dict(zip(
        nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(int),
        nat.column("n_name").to_pylist(),
    ))
    probe = df["c_custkey"].to_numpy(np.int64)
    pos = np.minimum(np.searchsorted(ck_s, probe), max(len(ck_s) - 1, 0))
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["c_name"] = cname[pos].astype(str)
    df["n_name"] = [nmap.get(int(nk), "") for nk in cnat[pos]]
    df["revenue"] = (df["rev_cc"] / 10000.0).round(6)
    return pa.Table.from_pandas(
        df[["rank", "c_custkey", "c_name", "n_name", "revenue"]],
        preserve_index=False,
    )


_Q10_SQL = f"""
WITH r AS (
  SELECT l_orderkey AS o_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_cc
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
j AS (
  SELECT o.o_custkey, r.rev_cc
  FROM r JOIN orders o ON r.o_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '{Q10_DATE_FROM} 00:00:00'
    AND o.o_orderdate < TIMESTAMP '{Q10_DATE_TO} 00:00:00'),
c AS (
  SELECT o_custkey AS c_custkey, sum(rev_cc) AS rev_cc
  FROM j GROUP BY 1)
SELECT row_number() OVER (ORDER BY c.rev_cc DESC, c.c_custkey) AS rank,
       c.c_custkey, cu.c_name, n.n_name,
       round(c.rev_cc / 10000.0, 6) AS revenue
FROM c
JOIN customer cu ON c.c_custkey = cu.c_custkey
JOIN nation n ON cu.c_nationkey = n.n_nationkey
ORDER BY c.rev_cc DESC, c.c_custkey
LIMIT {TOPK_CUSTOMERS}
"""


register("rel_pricing_summary", q_pricing_summary, _PRICING_SQL)
register("rel_revenue_by_nation", q_revenue_by_nation, _REVENUE_SQL)
register("rel_order_revenue_topk", q_order_revenue_topk, _Q3_SQL)
register("rel_churned_customers", q_churned_customers, _CHURN_SQL)
register("rel_orders_with_returns", q_orders_with_returns, _RETURNS_SQL)
register("rel_local_supply_revenue", q_local_supply_revenue, _Q5_SQL)
register("rel_orders_pivot", q_orders_pivot, _PIVOT_SQL)
register("rel_revenue_rollup", q_revenue_rollup, _ROLLUP_SQL)
register("rel_customer_order_distribution", q_customer_order_distribution,
         _Q13_SQL)
register("rel_promo_revenue", q_promo_revenue, _Q14_SQL)
register("rel_top_suppliers", q_top_suppliers, _Q15_SQL)
register("rel_big_orders", q_big_orders, _Q18_SQL)
register("rel_idle_rich_customers", q_idle_rich_customers, _Q22_SQL)
register("rel_part_type_suppliers", q_part_type_suppliers, _Q16_SQL)
register("rel_forecast_revenue", q_forecast_revenue, _Q6_SQL)
register("rel_returned_item_losses", q_returned_item_losses, _Q10_SQL)
