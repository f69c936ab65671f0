"""Third relational tranche — the Q9 "product-type profit" join shape the
first two tranches don't exercise: TWO broadcast dimension resolves on the
SAME fact row (part attributes supply a per-row cost term, supplier keys
resolve the grouping nation) feeding one orderkey hash join that exists
only to fetch the order YEAR for the group key.

Profit per line = extendedprice*(1-discount) - quantity*retailprice*COST%,
folded as exact x10000 scaled integers so the distributed sum order cannot
drift against the DuckDB mirror. (The classic Q9 uses ps_supplycost from
partsupp; this corpus has no partsupp table, so the cost term is the
part's retail price at a fixed cost fraction — same join shape, same
arithmetic pattern, SQL-expressible.)

100-TB notes: the part subset (name-filtered) and supplier->nation arrays
are DIMENSIONS shipped once via ray.put; the only all-to-all exchange is
the orderkey join, which carries per-block pre-reduced (orderkey, nation,
profit_cc) combiner rows — at most one row per (order, nation) per block,
never raw lineitem rows. Post-join output folds straight into a 25x|years|
group, so the final groupby is tiny.

The reference (connector.go) has no relational engine; parity is pinned
against the SQL mirror only (see relational.py module docstring).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .entry_queries import register
from ..rayenv import remote_kwargs
from .relutil import _lookup_int, _q3_join_sentinels, _read

# deferred module binding (attribute access at call time): relational2 is
# mid-init when entry_queries imports this module, so a `from .relational2
# import name` here would crash — same pattern as corpus.py's `_dedup`.
from . import relational2 as _r2

Q9_NAME_SUBSTR = "red"  # part-name filter (Q9's `p_name like '%green%'`)
Q9_COST_PCT = 60  # cost term = 60% of the part's retail price


def _q9_part_arrays(sf_dir: str):
    """Sorted (partkey, retail-cents) for parts whose name matches — the
    name-filtered part dimension, broadcast once."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    mask = pc.match_substring(part.column("p_name"), Q9_NAME_SUBSTR)
    part = part.filter(mask)
    k = (
        part.column("p_partkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    retail_c = np.rint(
        part.column("p_retailprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    order = np.argsort(k, kind="stable")
    return k[order], retail_c[order]


def q_profit_by_nation_year(sf_dir: str):
    """Q9 shape: profit on name-matched parts per (supplier nation, order
    year). profit = extprice*(1-disc) - qty*retailprice*60%."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from .blockutil import retype_block

    part_ref = ray.put(_q9_part_arrays(sf_dir))
    sup_ref = ray.put(_r2._supp_nation_arrays(sf_dir))

    def li_partials(batch: pa.Table) -> pa.Table:
        pk, retail_c = ray.get(part_ref)
        sk, sn = ray.get(sup_ref)
        partk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cost_c = _lookup_int(pk, retail_c, partk)  # -1 = part not matched
        keep = cost_c >= 0
        if not keep.any():
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "supp_nk": pa.array([], pa.int64()),
                 "profit_cc": pa.array([], pa.int64())}
            )
        supk = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        snat = _lookup_int(sk, sn, supk)
        okey = (
            batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        qty = np.rint(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        profit_cc = (
            _r2._money_cc(batch)[keep] - qty * cost_c[keep] * Q9_COST_PCT
        )
        (gok, gsn), gv, _ = _r2._group_sum_int(
            [okey, snat], {"profit_cc": profit_cc}
        )
        return pa.table(
            {"o_orderkey": pa.array(gok, pa.int64()),
             "supp_nk": pa.array(gsn, pa.int64()),
             "profit_cc": pa.array(gv["profit_cc"], pa.int64())}
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = od.astype("datetime64[Y]").astype(np.int64) + 1970
        okey = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {"o_orderkey": pa.array(okey, pa.int64()),
             "o_year": pa.array(year, pa.int64())}
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    ).map_batches(li_partials, batch_format="pyarrow", **remote_kwargs())
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pyarrow", **remote_kwargs()
    )
    sent = _q3_join_sentinels(_r2.R2_JOIN_PARTITIONS)
    li = li.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "supp_nk": pa.array([-1] * len(sent), pa.int64()),
         "profit_cc": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "o_year": pa.array([0] * len(sent), pa.int64())}
    )))
    joined = li.join(
        orders, join_type="inner", num_partitions=_r2.R2_JOIN_PARTITIONS,
        on=("o_orderkey",),
    )

    def post_join(t: pa.Table) -> pa.Table:
        nk = t.column("supp_nk").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nk >= 0  # sentinel rows out
        year = (
            t.column("o_year").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        prof = (
            t.column("profit_cc").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        if len(year) == 0:
            return pa.table(
                {"supp_nk": pa.array([], pa.int64()),
                 "o_year": pa.array([], pa.int64()),
                 "profit_cc": pa.array([], pa.int64())}
            )
        (gy, gnk), gv, _ = _r2._group_sum_int(
            [year, nk[keep]], {"profit_cc": prof}
        )
        return pa.table(
            {"supp_nk": pa.array(gnk, pa.int64()),
             "o_year": pa.array(gy, pa.int64()),
             "profit_cc": pa.array(gv["profit_cc"], pa.int64())}
        )

    df = (
        joined.map_batches(post_join, batch_format="pyarrow", **remote_kwargs())
        .groupby(["supp_nk", "o_year"])
        .aggregate(Sum("profit_cc", alias_name="profit_cc"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"supp_nk": ("supp_nk", pa.int64()),
                 "o_year": ("o_year", pa.int64()),
                 "profit_cc": ("profit_cc", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"nation": pa.array([], pa.string()),
             "o_year": pa.array([], pa.int64()),
             "profit": pa.array([], pa.float64())}
        )
    df["nation"] = "NATION_" + df["supp_nk"].astype(str)
    df["profit"] = (df["profit_cc"] / 10000.0).round(6)
    df = df.sort_values(["nation", "o_year"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["nation", "o_year", "profit"]], preserve_index=False
    )


_Q9_SQL = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                 - CAST(round(l.l_quantity) AS BIGINT)
                   * CAST(round(p.p_retailprice * 100) AS BIGINT)
                   * {Q9_COST_PCT}) / 10000.0, 6) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{Q9_NAME_SUBSTR}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""

register("rel_profit_by_nation_year", q_profit_by_nation_year, _Q9_SQL)


# ---------------------------------------------------------------------------
# order-to-ship latency percentiles per order priority — the cross-family
# composition: the Q12-style fact-fact orderkey hash join feeds the
# bounded-distribution quantile engine. Lineitem pre-reduces to (orderkey,
# ship-day, cnt) per block (same-day ships within an order collapse before
# the exchange); post-join rows pre-reduce again to (priority, latency-days,
# cnt) cells, so the quantile fold only ever sees distinct cells. Latency
# is exact integer days on both engines (epoch_us // day).
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_ship_latency_quantiles(sf_dir: str):
    """Per-priority percentiles of (ship day - order day): one row per
    o_orderpriority with n and p25/50/75/90/99 in whole days."""
    import ray
    import ray.data

    from . import quantiles as _q

    def li_side(batch: pa.Table) -> pa.Table:
        ok = (
            batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        day = (
            batch.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64) // _DAY_US
        )
        (gok, gd), gv, cnt = _r2._group_sum_int(
            [ok, day], {}
        )
        return pa.table(
            {"l_orderkey": pa.array(gok, pa.int64()),
             "ship_day": pa.array(gd, pa.int64()),
             "cnt": pa.array(cnt, pa.int64())}
        )

    def o_side(batch: pa.Table) -> pa.Table:
        ok = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        day = (
            batch.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64) // _DAY_US
        )
        pri = batch.column("o_orderpriority")
        return pa.table(
            {"l_orderkey": pa.array(ok, pa.int64()),
             "order_day": pa.array(day, pa.int64()),
             "pri": pri}
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        li_side, batch_format="pyarrow", **remote_kwargs()
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(o_side, batch_format="pyarrow", **remote_kwargs())
    sent = _q3_join_sentinels(_r2.R2_JOIN_PARTITIONS)
    li = li.union(ray.data.from_arrow(pa.table(
        {"l_orderkey": pa.array(sent, pa.int64()),
         "ship_day": pa.array([0] * len(sent), pa.int64()),
         "cnt": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"l_orderkey": pa.array(sent, pa.int64()),
         "order_day": pa.array([0] * len(sent), pa.int64()),
         "pri": pa.array(["\x00"] * len(sent), pa.string())}
    )))
    joined = li.join(
        orders, join_type="inner", num_partitions=_r2.R2_JOIN_PARTITIONS,
        on=("l_orderkey",),
    )

    def lat_partials(batch: pa.Table) -> pa.Table:
        cnt = (
            batch.column("cnt").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = cnt > 0  # sentinel rows out
        if not keep.any():
            return pa.table(
                {"pri": pa.array([], pa.string()),
                 "v": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        lat = (
            batch.column("ship_day").to_numpy(zero_copy_only=False)
            .astype(np.int64)
            - batch.column("order_day").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )[keep]
        pri = (
            batch.column("pri").to_numpy(zero_copy_only=False)
            .astype(str)[keep]
        )
        c = cnt[keep]
        # weighted distinct-cell pre-reduce (same cells the fold sums)
        order = np.lexsort((lat, pri))
        p_s, l_s, c_s = pri[order], lat[order], c[order]
        boundary = (p_s[1:] != p_s[:-1]) | (l_s[1:] != l_s[:-1])
        first = np.flatnonzero(np.concatenate([[True], boundary]))
        return pa.table(
            {"pri": pa.array(p_s[first], pa.string()),
             "v": pa.array(l_s[first], pa.int64()),
             "cnt": pa.array(np.add.reduceat(c_s, first), pa.int64())}
        )

    df = _q._grouped_quantiles(joined, lat_partials, "pri")
    if isinstance(df, pa.Table):  # empty-input sentinel
        cols = {"pri": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        for p in _q.PCTS:
            cols[f"p{p}"] = pa.array([], pa.int64())
        return pa.table(cols)
    return pa.Table.from_pandas(
        df[["pri", "n"] + [f"p{p}" for p in _q.PCTS]], preserve_index=False
    )


def _ship_latency_sql() -> str:
    from . import quantiles as _q

    pct_cols = ",\n       ".join(
        f"max(CASE WHEN r.rk = ((n.n - 1) * {p}) // 100 "
        f"THEN r.lat END) AS p{p}" for p in _q.PCTS
    )
    return f"""
WITH j AS (
  SELECT o.o_orderpriority AS pri,
         epoch_us(l.l_shipdate) // {_DAY_US}
           - epoch_us(o.o_orderdate) // {_DAY_US} AS lat
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
r AS (SELECT pri, lat,
             row_number() OVER (PARTITION BY pri ORDER BY lat) - 1 AS rk
      FROM j),
n AS (SELECT pri, count(*) AS n FROM j GROUP BY 1)
SELECT r.pri, max(n.n) AS n,
       {pct_cols}
FROM r JOIN n USING (pri)
GROUP BY 1 ORDER BY 1
"""


register("rel_ship_latency_quantiles", q_ship_latency_quantiles)
from .entry_queries import register_lazy_sql  # noqa: E402

register_lazy_sql("rel_ship_latency_quantiles", _ship_latency_sql)
