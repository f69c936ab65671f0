"""Second tranche of relational/analytics shapes over the TPC-H-ish tables
— the join patterns the first tranche (relational.py) doesn't exercise:

* rel_priority_backlog   — Q4 shape: EXISTS semi-join where the PROBE side
  is a pre-reduced distinct-key stream, grouped counts on the kept side.
* rel_shipstatus_priority — Q12 shape: fact-fact equi-join (lineitem x
  orders) feeding a two-bucket conditional count.
* rel_nation_volume      — Q7 shape: two broadcast dimension resolves (one
  per fact side) + ONE orderkey hash join, grouped by nation pair x year.
* rel_market_share       — Q8 shape: broadcast part-set membership +
  broadcast nation resolve on both sides, share = flagged/total per year.
* rel_small_qty_revenue  — Q17 shape: per-key aggregate broadcast BACK over
  the same fact table (two passes, zero fact shuffle).
* rel_bracket_revenue    — Q19 shape: disjunctive multi-bracket predicate
  resolved from broadcast part attributes, zero-exchange global sum.
* rel_late_sole_supplier — Q21 shape: single-sort sort-merge join (order
  row + per-(order,supplier) pairs share one encoded int64 key), boundary-
  safe per-segment fold with a sum-trick sole-supplier extraction.

All money folds as x100 / x10000 scaled integers (distributed order can't
drift vs the DuckDB mirrors); every fact-side map pre-aggregates inside the
block so shuffles carry combiner output, never raw fact rows. The reference
(connector.go) has no relational engine — these queries exist because the
Ray engine is a general data-processing tool; parity is pinned purely
against the SQL mirrors below.

100-TB notes: the orderkey hash joins are honest all-to-all exchanges of
pre-reduced rows (set *_JOIN_PARTITIONS to O(cluster cores)); every
broadcast here is a DIMENSION (supplier / customer keys->nationkey, a
filtered part subset) shipped once via ray.put — at |part| beyond ~10^8
switch the part-side membership to a partkey hash join (the Q3 sentinel
machinery already supports it).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .entry_queries import register
from ..rayenv import remote_kwargs
from .relutil import _lookup_int, _q3_join_sentinels, _read

#: hash-join partition count — sized to this box; at cluster scale set to
#: O(total cores) so every aggregator holds ~1/N of the smaller side
R2_JOIN_PARTITIONS = 8

_US_PER_DAY = 86_400_000_000


def _money_cc(batch: pa.Table) -> np.ndarray:
    """price * (1 - discount) as exact x10000 integers."""
    price_c = np.rint(
        batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    disc_c = np.rint(
        batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)
    return price_c * (100 - disc_c)


def _group_sum_int(keys: list[np.ndarray], vals: dict[str, np.ndarray]):
    """In-block combiner: lexsort on ``keys`` (LAST array = primary sort
    key), sum each int array in ``vals`` per distinct key tuple. Returns
    (grouped_keys — same order as ``keys``, grouped_vals, counts)."""
    n = len(keys[0])
    if n == 0:
        return (
            [k[:0] for k in keys],
            {name: v[:0] for name, v in vals.items()},
            np.array([], np.int64),
        )
    order = np.lexsort(tuple(keys))
    sorted_keys = [k[order] for k in keys]
    boundary = np.zeros(n - 1, dtype=bool)
    for k in sorted_keys:
        boundary |= k[1:] != k[:-1]
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    gkeys = [k[first] for k in sorted_keys]
    gvals = {name: np.add.reduceat(v[order], first) for name, v in vals.items()}
    counts = np.diff(np.append(first, n)).astype(np.int64)
    return gkeys, gvals, counts


# ---------------------------------------------------------------------------
# Q4 shape — priority backlog: orders placed in one quarter that still had a
# line item shipping after the late cutoff, counted per order priority.
# Probe side pre-reduces to per-block DISTINCT orderkeys (one int64 column
# shuffles); kept side is the filtered orders scan; Ray's native left_semi
# hash join does the EXISTS.
# ---------------------------------------------------------------------------

Q4_ORDER_FROM = "1997-01-01"
Q4_ORDER_TO = "1997-04-01"  # exclusive
Q4_LATE_SHIP = "1997-07-01"  # shipped on/after this = backlog


def _late_ship_order_keys(batch: pa.Table) -> pa.Table:
    ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
    keep = ship >= np.datetime64(Q4_LATE_SHIP)
    okey = (
        batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)[keep]
    )
    return pa.table({"l_orderkey": pa.array(np.unique(okey), pa.int64())})


def _q4_orders_filter(batch: pa.Table) -> pa.Table:
    od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
    keep = (od >= np.datetime64(Q4_ORDER_FROM)) & (
        od < np.datetime64(Q4_ORDER_TO)
    )
    return batch.filter(pa.array(keep))


def _q4_partials(batch: pa.Table) -> pa.Table:
    okey = (
        batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    keep = okey >= 0  # sentinel rows out
    pri = (
        batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        .astype(str)[keep]
    )
    if len(pri) == 0:
        return pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    u, c = np.unique(pri, return_counts=True)
    return pa.table(
        {"o_orderpriority": pa.array(u, pa.string()),
         "n": pa.array(c.astype(np.int64), pa.int64())}
    )


def q_priority_backlog(sf_dir: str):
    """Q4 shape: per-priority count of quarter orders with a late-shipping
    line item (EXISTS as a native left_semi hash join; the probe side
    shuffles per-block distinct orderkeys only)."""
    import ray.data
    from ray.data.aggregate import Sum

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(_q4_orders_filter, batch_format="pyarrow", **remote_kwargs())
    probe = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        _late_ship_order_keys, batch_format="pyarrow", **remote_kwargs()
    )
    sent = _q3_join_sentinels(R2_JOIN_PARTITIONS)
    sdate = np.full(len(sent), np.datetime64(Q4_ORDER_FROM, "us"))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "o_orderdate": pa.array(sdate),
         "o_orderpriority": pa.array([""] * len(sent), pa.string())}
    )))
    probe = probe.union(ray.data.from_arrow(pa.table(
        {"l_orderkey": pa.array(sent, pa.int64())}
    )))
    kept = orders.join(
        probe, join_type="left_semi", num_partitions=R2_JOIN_PARTITIONS,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )
    df = (
        kept.map_batches(_q4_partials, batch_format="pyarrow",
                         **remote_kwargs())
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n_orders": pa.array([], pa.int64())}
        )
    df = df.rename(columns={"n": "n_orders"})
    df = df.sort_values("o_orderpriority").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["o_orderpriority", "n_orders"]], preserve_index=False
    )


_Q4_SQL = f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_ORDER_FROM} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q4_ORDER_TO} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= TIMESTAMP '{Q4_LATE_SHIP} 00:00:00')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q12 shape — line status x order priority class: line items shipped in a
# year, joined to their order's priority, counted as high- vs low-priority
# lines per line status. (The canonical Q12 groups by l_shipmode, which the
# synth schema doesn't carry; l_linestatus plays that role.) The lineitem
# side pre-aggregates per (orderkey, linestatus) so the join exchange
# carries combiner rows.
# ---------------------------------------------------------------------------

Q12_SHIP_FROM = "1996-01-01"
Q12_SHIP_TO = "1997-01-01"  # exclusive
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def _q12_lineitem_partials(batch: pa.Table) -> pa.Table:
    ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
    keep = (ship >= np.datetime64(Q12_SHIP_FROM)) & (
        ship < np.datetime64(Q12_SHIP_TO)
    )
    if not keep.all():
        batch = batch.filter(pa.array(keep))
    if batch.num_rows == 0:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "l_linestatus": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    okey = (
        batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    # encode the 1-char status as its codepoint so the combiner lexsorts
    # two int arrays (no per-row string compares in the hot path)
    ls_code = np.frombuffer(
        "".join(
            batch.column("l_linestatus").to_numpy(zero_copy_only=False)
        ).encode("ascii"),
        dtype=np.uint8,
    ).astype(np.int64)
    (gls, gok), _, counts = _group_sum_int([ls_code, okey], {})
    return pa.table(
        {
            "o_orderkey": pa.array(gok, pa.int64()),
            "l_linestatus": pa.array(
                [chr(c) for c in gls], pa.string()
            ),
            "n": pa.array(counts, pa.int64()),
        }
    )


def _q12_post_join(batch: pa.Table) -> pa.Table:
    okey = (
        batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    keep = okey >= 0
    if not keep.all():
        batch = batch.filter(pa.array(keep))
    if batch.num_rows == 0:
        return pa.table(
            {"l_linestatus": pa.array([], pa.string()),
             "high_line_count": pa.array([], pa.int64()),
             "low_line_count": pa.array([], pa.int64())}
        )
    pri = (
        batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        .astype(str)
    )
    n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    high = np.isin(pri, HIGH_PRIORITIES)
    ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False).astype(str)
    ls_code = np.array([ord(s[0]) for s in ls], dtype=np.int64)
    (gcode,), gvals, _ = _group_sum_int(
        [ls_code],
        {"high": np.where(high, n, 0), "low": np.where(high, 0, n)},
    )
    return pa.table(
        {
            "l_linestatus": pa.array([chr(c) for c in gcode], pa.string()),
            "high_line_count": pa.array(gvals["high"], pa.int64()),
            "low_line_count": pa.array(gvals["low"], pa.int64()),
        }
    )


def q_shipstatus_priority(sf_dir: str):
    """Q12 shape: high-/low-priority line counts per line status over a
    ship-year window — per-(orderkey, status) combiner rows hash-join the
    orders priority column."""
    import ray.data
    from ray.data.aggregate import Sum

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"]
    ).map_batches(_q12_lineitem_partials, batch_format="pyarrow",
                  **remote_kwargs())
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    sent = _q3_join_sentinels(R2_JOIN_PARTITIONS)
    li = li.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "l_linestatus": pa.array(["F"] * len(sent), pa.string()),
         "n": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "o_orderpriority": pa.array([""] * len(sent), pa.string())}
    )))
    joined = li.join(
        orders, join_type="inner", num_partitions=R2_JOIN_PARTITIONS,
        on=("o_orderkey",),
    )
    df = (
        joined.map_batches(_q12_post_join, batch_format="pyarrow",
                           **remote_kwargs())
        .groupby("l_linestatus")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"l_linestatus": pa.array([], pa.string()),
             "high_line_count": pa.array([], pa.int64()),
             "low_line_count": pa.array([], pa.int64())}
        )
    df = df.sort_values("l_linestatus").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["l_linestatus", "high_line_count", "low_line_count"]],
        preserve_index=False,
    )


_Q12_SQL = f"""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{Q12_SHIP_FROM} 00:00:00'
  AND l.l_shipdate < TIMESTAMP '{Q12_SHIP_TO} 00:00:00'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q7 shape — cross-nation trade volume: revenue shipped between two nations
# (both directions), by supplier nation x customer nation x ship year.
# supplier->nation and customer->nation broadcast once (sorted arrays via
# ray.put); the single exchange is the orderkey hash join of pre-filtered
# combiner rows.
# ---------------------------------------------------------------------------

Q7_NATION_A = 1
Q7_NATION_B = 2
Q7_SHIP_FROM = "1996-01-01"
Q7_SHIP_TO = "1998-01-01"  # exclusive


def _supp_nation_arrays(sf_dir: str):
    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    k = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    v = (
        sup.column("s_nationkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    order = np.argsort(k, kind="stable")
    return k[order], v[order]


def _cust_nation_arrays(sf_dir: str):
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    k = (
        cust.column("c_custkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    v = (
        cust.column("c_nationkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    order = np.argsort(k, kind="stable")
    return k[order], v[order]


def q_nation_volume(sf_dir: str):
    """Q7 shape: shipped revenue between NATION_A and NATION_B (either
    direction) per (supp_nation, cust_nation, ship year)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum
    from .blockutil import retype_block

    sup_ref = ray.put(_supp_nation_arrays(sf_dir))
    cust_ref = ray.put(_cust_nation_arrays(sf_dir))
    pair = (Q7_NATION_A, Q7_NATION_B)

    def li_partials(batch: pa.Table) -> pa.Table:
        sk, sn = ray.get(sup_ref)
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (ship >= np.datetime64(Q7_SHIP_FROM)) & (
            ship < np.datetime64(Q7_SHIP_TO)
        )
        supk = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        snat = _lookup_int(sk, sn, supk)
        keep &= np.isin(snat, pair)
        okey = (
            batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        if len(okey) == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "supp_nk": pa.array([], pa.int64()),
                 "l_year": pa.array([], pa.int64()),
                 "rev_cc": pa.array([], pa.int64())}
            )
        snat = snat[keep]
        year = ship[keep].astype("datetime64[Y]").astype(np.int64) + 1970
        rev_cc = _money_cc(batch)[keep]
        (gy, gsn, gok), gv, _ = _group_sum_int(
            [year, snat, okey], {"rev_cc": rev_cc}
        )
        return pa.table(
            {"o_orderkey": pa.array(gok, pa.int64()),
             "supp_nk": pa.array(gsn, pa.int64()),
             "l_year": pa.array(gy, pa.int64()),
             "rev_cc": pa.array(gv["rev_cc"], pa.int64())}
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        custk = (
            batch.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cnat = _lookup_int(ck, cn, custk)
        keep = np.isin(cnat, pair)
        okey = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        return pa.table(
            {"o_orderkey": pa.array(okey, pa.int64()),
             "cust_nk": pa.array(cnat[keep], pa.int64())}
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"],
    ).map_batches(li_partials, batch_format="pyarrow", **remote_kwargs())
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_side, batch_format="pyarrow", **remote_kwargs()
    )
    sent = _q3_join_sentinels(R2_JOIN_PARTITIONS)
    li = li.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "supp_nk": pa.array([-1] * len(sent), pa.int64()),
         "l_year": pa.array([0] * len(sent), pa.int64()),
         "rev_cc": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "cust_nk": pa.array([-1] * len(sent), pa.int64())}
    )))
    joined = li.join(
        orders, join_type="inner", num_partitions=R2_JOIN_PARTITIONS,
        on=("o_orderkey",),
    )

    def post_join(t: pa.Table) -> pa.Table:
        sn = t.column("supp_nk").to_numpy(zero_copy_only=False).astype(np.int64)
        cn = t.column("cust_nk").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((sn == pair[0]) & (cn == pair[1])) | (
            (sn == pair[1]) & (cn == pair[0])
        )
        year = t.column("l_year").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        rev = t.column("rev_cc").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        if len(year) == 0:
            return pa.table(
                {"supp_nk": pa.array([], pa.int64()),
                 "cust_nk": pa.array([], pa.int64()),
                 "l_year": pa.array([], pa.int64()),
                 "rev_cc": pa.array([], pa.int64())}
            )
        (gy, gc, gs), gv, _ = _group_sum_int(
            [year, cn[keep], sn[keep]], {"rev_cc": rev}
        )
        return pa.table(
            {"supp_nk": pa.array(gs, pa.int64()),
             "cust_nk": pa.array(gc, pa.int64()),
             "l_year": pa.array(gy, pa.int64()),
             "rev_cc": pa.array(gv["rev_cc"], pa.int64())}
        )

    df = (
        joined.map_batches(post_join, batch_format="pyarrow", **remote_kwargs())
        .groupby(["supp_nk", "cust_nk", "l_year"])
        .aggregate(Sum("rev_cc", alias_name="rev_cc"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"supp_nk": ("supp_nk", pa.int64()),
                 "cust_nk": ("cust_nk", pa.int64()),
                 "l_year": ("l_year", pa.int64()),
                 "rev_cc": ("rev_cc", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"supp_nation": pa.array([], pa.string()),
             "cust_nation": pa.array([], pa.string()),
             "l_year": pa.array([], pa.int64()),
             "revenue": pa.array([], pa.float64())}
        )
    df["supp_nation"] = "NATION_" + df["supp_nk"].astype(str)
    df["cust_nation"] = "NATION_" + df["cust_nk"].astype(str)
    df["revenue"] = (df["rev_cc"] / 10000.0).round(6)
    df = df.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["supp_nation", "cust_nation", "l_year", "revenue"]],
        preserve_index=False,
    )


_Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             / 10000.0, 6) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{Q7_SHIP_FROM} 00:00:00'
  AND l.l_shipdate < TIMESTAMP '{Q7_SHIP_TO} 00:00:00'
  AND ((sn.n_nationkey = {Q7_NATION_A} AND cn.n_nationkey = {Q7_NATION_B})
    OR (sn.n_nationkey = {Q7_NATION_B} AND cn.n_nationkey = {Q7_NATION_A}))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 shape — national market share: of the PROMO-type-part revenue ordered
# by customers in one region over two years, the fraction supplied by one
# nation, per order year. Broadcasts: the promo partkey set (filtered
# dimension subset), supplier->nation, customer->nation. One orderkey join.
# ---------------------------------------------------------------------------

Q8_REGION_KEY = 2  # ASIA: nations with nationkey % 5 == 2
Q8_TARGET_NATION = 7  # supplier nation whose share we measure (in ASIA)
Q8_PART_TYPE = "PROMO"
Q8_ORDER_FROM = "1996-01-01"
Q8_ORDER_TO = "1998-01-01"  # exclusive


def _promo_part_keys(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    keys = (
        part.column("p_partkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ptype = part.column("p_type").to_numpy(zero_copy_only=False).astype(str)
    return np.sort(keys[ptype == Q8_PART_TYPE])


def q_market_share(sf_dir: str):
    """Q8 shape: per order year, NATION_{Q8_TARGET_NATION}'s share of
    region-ASIA customers' PROMO-part revenue."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum
    from .blockutil import retype_block

    promo_ref = ray.put(_promo_part_keys(sf_dir))
    sup_ref = ray.put(_supp_nation_arrays(sf_dir))
    cust_ref = ray.put(_cust_nation_arrays(sf_dir))

    def li_partials(batch: pa.Table) -> pa.Table:
        promo = ray.get(promo_ref)
        sk, sn = ray.get(sup_ref)
        pk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(promo) == 0:
            keep = np.zeros(len(pk), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(promo, pk), len(promo) - 1)
            keep = promo[pos] == pk
        supk = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        okey = (
            batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        if len(okey) == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "is_target": pa.array([], pa.int64()),
                 "rev_cc": pa.array([], pa.int64())}
            )
        snat = _lookup_int(sk, sn, supk[keep])
        flag = (snat == Q8_TARGET_NATION).astype(np.int64)
        rev = _money_cc(batch)[keep]
        (gf, gok), gv, _ = _group_sum_int([flag, okey], {"rev_cc": rev})
        return pa.table(
            {"o_orderkey": pa.array(gok, pa.int64()),
             "is_target": pa.array(gf, pa.int64()),
             "rev_cc": pa.array(gv["rev_cc"], pa.int64())}
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (od >= np.datetime64(Q8_ORDER_FROM)) & (
            od < np.datetime64(Q8_ORDER_TO)
        )
        custk = (
            batch.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cnat = _lookup_int(ck, cn, custk)
        keep &= (cnat % 5) == Q8_REGION_KEY
        okey = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        year = od[keep].astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {"o_orderkey": pa.array(okey, pa.int64()),
             "o_year": pa.array(year, pa.int64())}
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"],
    ).map_batches(li_partials, batch_format="pyarrow", **remote_kwargs())
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow", **remote_kwargs())
    sent = _q3_join_sentinels(R2_JOIN_PARTITIONS)
    li = li.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "is_target": pa.array([0] * len(sent), pa.int64()),
         "rev_cc": pa.array([0] * len(sent), pa.int64())}
    )))
    orders = orders.union(ray.data.from_arrow(pa.table(
        {"o_orderkey": pa.array(sent, pa.int64()),
         "o_year": pa.array([0] * len(sent), pa.int64())}
    )))
    joined = li.join(
        orders, join_type="inner", num_partitions=R2_JOIN_PARTITIONS,
        on=("o_orderkey",),
    )

    def post_join(t: pa.Table) -> pa.Table:
        okey = (
            t.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = okey >= 0
        year = t.column("o_year").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        flag = t.column("is_target").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        rev = t.column("rev_cc").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        if len(year) == 0:
            return pa.table(
                {"o_year": pa.array([], pa.int64()),
                 "target_cc": pa.array([], pa.int64()),
                 "total_cc": pa.array([], pa.int64())}
            )
        (gy,), gv, _ = _group_sum_int(
            [year], {"target_cc": np.where(flag == 1, rev, 0), "total_cc": rev}
        )
        return pa.table(
            {"o_year": pa.array(gy, pa.int64()),
             "target_cc": pa.array(gv["target_cc"], pa.int64()),
             "total_cc": pa.array(gv["total_cc"], pa.int64())}
        )

    df = (
        joined.map_batches(post_join, batch_format="pyarrow", **remote_kwargs())
        .groupby("o_year")
        .aggregate(
            Sum("target_cc", alias_name="target_cc"),
            Sum("total_cc", alias_name="total_cc"),
        )
        .map_batches(
            lambda t: retype_block(
                t,
                {"o_year": ("o_year", pa.int64()),
                 "target_cc": ("target_cc", pa.int64()),
                 "total_cc": ("total_cc", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"o_year": pa.array([], pa.int64()),
             "mkt_share": pa.array([], pa.float64())}
        )
    df = df[df["total_cc"] > 0]
    if len(df) == 0:
        return pa.table(
            {"o_year": pa.array([], pa.int64()),
             "mkt_share": pa.array([], pa.float64())}
        )
    df["mkt_share"] = (df["target_cc"] / df["total_cc"]).round(6)
    df = df.sort_values("o_year").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["o_year", "mkt_share"]], preserve_index=False
    )


_Q8_SQL = f"""
WITH j AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_cc,
         CASE WHEN s.s_nationkey = {Q8_TARGET_NATION} THEN 1 ELSE 0 END
           AS is_target
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE p.p_type = '{Q8_PART_TYPE}'
    AND c.c_nationkey % 5 = {Q8_REGION_KEY}
    AND o.o_orderdate >= TIMESTAMP '{Q8_ORDER_FROM} 00:00:00'
    AND o.o_orderdate < TIMESTAMP '{Q8_ORDER_TO} 00:00:00')
SELECT o_year,
       round(sum(CASE WHEN is_target = 1 THEN rev_cc ELSE 0 END)
             / CAST(sum(rev_cc) AS DOUBLE), 6) AS mkt_share
FROM j GROUP BY 1 HAVING sum(rev_cc) > 0 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity-order revenue: for one brand/size slice of
# parts, the average yearly revenue lost if sub-20%-of-average-quantity
# orders stopped. Pass 1 aggregates per-part (sum_qty, cnt) over the target
# parts (two-phase, result is |slice| rows); the tiny result broadcasts
# BACK over the same fact scan for pass 2. The comparison qty < 0.2 * avg
# is evaluated as exact integers (5 * qty * cnt < sum_qty), so parity with
# the mirror is bit-exact.
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#5"
Q17_MAX_SIZE = 25
#: driver-side bound on the broadcast per-part aggregate (the brand/size
#: slice is ~1/50 of |part|); beyond this switch to a partkey hash join
Q17_MAX_SLICE = 2_000_000


def _q17_part_keys(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    keys = (
        part.column("p_partkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    brand = part.column("p_brand").to_numpy(zero_copy_only=False).astype(str)
    size = part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    return np.sort(keys[(brand == Q17_BRAND) & (size <= Q17_MAX_SIZE)])


def q_small_qty_revenue(sf_dir: str):
    """Q17 shape: avg yearly revenue from sub-20%-of-average-quantity lines
    of one brand/size part slice (aggregate-broadcast-back, two fact passes,
    zero fact shuffle)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum
    from .blockutil import retype_block

    part_keys = _q17_part_keys(sf_dir)
    if len(part_keys) > Q17_MAX_SLICE:
        raise ValueError(
            f"Q17 part slice {len(part_keys)} exceeds Q17_MAX_SLICE "
            f"({Q17_MAX_SLICE}); use a partkey hash join for this scale"
        )
    keys_ref = ray.put(part_keys)

    def _member(pk: np.ndarray, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(len(pk), dtype=bool)
        pos = np.minimum(np.searchsorted(keys, pk), len(keys) - 1)
        return keys[pos] == pk

    def pass1(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        pk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = _member(pk, keys)
        pk = pk[keep]
        if len(pk) == 0:
            return pa.table(
                {"l_partkey": pa.array([], pa.int64()),
                 "qty_sum": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        qty = np.rint(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        (gpk,), gv, counts = _group_sum_int([pk], {"qty_sum": qty})
        return pa.table(
            {"l_partkey": pa.array(gpk, pa.int64()),
             "qty_sum": pa.array(gv["qty_sum"], pa.int64()),
             "cnt": pa.array(counts, pa.int64())}
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(pass1, batch_format="pyarrow", **remote_kwargs())
        .groupby("l_partkey")
        .aggregate(Sum("qty_sum", alias_name="qty_sum"),
                   Sum("cnt", alias_name="cnt"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"l_partkey": ("l_partkey", pa.int64()),
                 "qty_sum": ("qty_sum", pa.int64()),
                 "cnt": ("cnt", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    apk = np.sort(agg["l_partkey"].to_numpy(np.int64)) if len(agg) else np.array([], np.int64)
    order = np.argsort(agg["l_partkey"].to_numpy(np.int64), kind="stable") if len(agg) else []
    asum = agg["qty_sum"].to_numpy(np.int64)[order] if len(agg) else np.array([], np.int64)
    acnt = agg["cnt"].to_numpy(np.int64)[order] if len(agg) else np.array([], np.int64)
    avg_ref = ray.put((apk, asum, acnt))

    def pass2(batch: pa.Table) -> pa.Table:
        apk_, asum_, acnt_ = ray.get(avg_ref)
        pk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = _member(pk, apk_)
        if not keep.any():
            return pa.table({"price_c": pa.array([], pa.int64())})
        pk = pk[keep]
        qty = np.rint(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        price_c = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            * 100
        ).astype(np.int64)
        pos = np.searchsorted(apk_, pk)
        # qty < 0.2 * (sum/cnt)  <=>  5 * qty * cnt < sum (exact integers)
        small = 5 * qty * acnt_[pos] < asum_[pos]
        return pa.table(
            {"price_c": pa.array([int(price_c[small].sum())], pa.int64())}
        )

    total = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(pass2, batch_format="pyarrow", **remote_kwargs())
        .sum("price_c")
    )
    total = int(total or 0)
    return pa.table(
        {"avg_yearly": pa.array([round(total / 100.0 / 7.0, 6)], pa.float64())}
    )


_Q17_SQL = f"""
WITH target AS (
  SELECT p_partkey FROM part
  WHERE p_brand = '{Q17_BRAND}' AND p_size <= {Q17_MAX_SIZE}),
a AS (
  SELECT l_partkey,
         sum(CAST(round(l_quantity) AS BIGINT)) AS qty_sum,
         count(*) AS cnt
  FROM lineitem JOIN target ON l_partkey = p_partkey
  GROUP BY 1)
SELECT round(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
             / 100.0 / 7.0, 6) AS avg_yearly
FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey
WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * a.cnt < a.qty_sum
"""


# ---------------------------------------------------------------------------
# Q19 shape — bracketed-discount revenue: revenue from line items matching
# any of three (brand, size bracket, quantity bracket) disjuncts. Part
# attributes (brand id, size) broadcast once as dense arrays; the fact scan
# is a single zero-exchange pass ending in a global sum.
# ---------------------------------------------------------------------------

Q19_BRACKETS = (
    # (brand, max_size, qty_from, qty_to) — qty bounds inclusive
    ("Brand#1", 5, 1, 11),
    ("Brand#2", 10, 10, 20),
    ("Brand#3", 15, 20, 30),
)


def _part_attr_arrays(sf_dir: str):
    """Sorted partkey -> (brand id, size) broadcast arrays. Brand ids are
    the integer after 'Brand#' so the hot path compares ints, not strings."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    keys = (
        part.column("p_partkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    brand = np.array(
        [int(b.rsplit("#", 1)[1]) for b in part.column("p_brand").to_pylist()],
        dtype=np.int64,
    )
    size = part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    return keys[order], brand[order], size[order]


def q_bracket_revenue(sf_dir: str):
    """Q19 shape: global discounted revenue over three disjunctive
    (brand, size, quantity) brackets — broadcast part attrs, one pass,
    no exchange."""
    import ray

    attr_ref = ray.put(_part_attr_arrays(sf_dir))
    brackets = [
        (int(b.rsplit("#", 1)[1]), mx, lo, hi)
        for b, mx, lo, hi in Q19_BRACKETS
    ]

    def partials(batch: pa.Table) -> pa.Table:
        keys, brand, size = ray.get(attr_ref)
        pk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        qty = np.rint(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        b = _lookup_int(keys, brand, pk)
        s = _lookup_int(keys, size, pk, default=-1)
        mask = np.zeros(len(pk), dtype=bool)
        for bid, mx, lo, hi in brackets:
            mask |= (b == bid) & (s >= 1) & (s <= mx) & (qty >= lo) & (qty <= hi)
        rev = _money_cc(batch)[mask]
        return pa.table({"rev_cc": pa.array([int(rev.sum())], pa.int64())})

    total = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partials, batch_format="pyarrow", **remote_kwargs())
        .sum("rev_cc")
    )
    total = int(total or 0)
    return pa.table(
        {"revenue": pa.array([round(total / 10000.0, 6)], pa.float64())}
    )


def _q19_disjunct_sql() -> str:
    parts = []
    for b, mx, lo, hi in Q19_BRACKETS:
        parts.append(
            f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {mx}"
            f" AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN {lo} AND {hi})"
        )
    return " OR ".join(parts)


_Q19_SQL = f"""
SELECT round(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 0)
             / 10000.0, 6) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_q19_disjunct_sql()}
"""


# ---------------------------------------------------------------------------
# Q21 shape — sole-late-supplier ranking: for finished multi-supplier
# orders where EXACTLY ONE supplier shipped late (> 90 days after the order
# date), count blame per supplier and rank the top offenders. ONE exchange:
# a sort-merge join — both streams carry an int64 key ``okey << 21 | tag``
# (tag 0 = the order row, tag suppkey+1 = a per-block-deduped pair row), so
# one sort co-locates each order's row with its supplier pairs, order row
# first. The per-block fold then computes distinct-supplier and late counts
# per order segment and emits per-supplier blame partials; a block's FIRST
# and LAST segments may be halves of a segment split across neighboring
# blocks (Ray re-splits big sorted partitions at target_max_block_size), so
# their raw rows ride a tiny side-channel (bounded by block count x segment
# size, not data size) folded exactly once on the driver. Measured at 10x
# TPC-H volume this replaced a pair-level hash aggregate + hash join + per-
# order hash aggregate (108 s) with one 7.5M-row sort (~12 s) + local folds.
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 90
TOPK_SUPPLIERS = 10
#: bits reserved for the supplier tag in the sort-merge key; suppkey must
#: stay below 2^21 - 1 and orderkey below 2^42 — raise the split (key is
#: int64) if a deployment exceeds them
Q21_SUPP_BITS = 21
_Q21_SUPP_CAP = (1 << Q21_SUPP_BITS) - 1
_Q21_OKEY_CAP = 1 << (63 - Q21_SUPP_BITS)


def _q21_pair_partials(batch: pa.Table) -> pa.Table:
    """Per-block (orderkey, suppkey) -> max shipdate, emitted as sort-merge
    rows (k = okey << SUPP_BITS | suppkey + 1, suppkey, ts)."""
    okey = (
        batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    supp = (
        batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ship = (
        batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").astype(np.int64)
    )
    if len(okey) == 0:
        return pa.table(
            {"k": pa.array([], pa.int64()),
             "suppkey": pa.array([], pa.int64()),
             "ts": pa.array([], pa.int64())}
        )
    if int(supp.max()) >= _Q21_SUPP_CAP or int(okey.max()) >= _Q21_OKEY_CAP:
        raise ValueError(
            "rel_late_sole_supplier: suppkey/orderkey exceed the sort-merge "
            "key split (Q21_SUPP_BITS); widen the split for this deployment"
        )
    order = np.lexsort((supp, okey))
    ok_s, sp_s, sh_s = okey[order], supp[order], ship[order]
    boundary = (ok_s[1:] != ok_s[:-1]) | (sp_s[1:] != sp_s[:-1])
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    return pa.table(
        {"k": pa.array(
            (ok_s[first] << Q21_SUPP_BITS) | (sp_s[first] + 1), pa.int64()
         ),
         "suppkey": pa.array(sp_s[first], pa.int64()),
         "ts": pa.array(np.maximum.reduceat(sh_s, first), pa.int64())}
    )


def _q21_fold_segments(okey, supp, ts, late_us):
    """Fold globally-complete, k-sorted (okey, supp, ts) rows: per order
    segment (order row tag supp == -1 first), dedupe adjacent pair rows
    (max ts), apply Q21 semantics, return blamed suppkeys (one per order)."""
    if len(okey) == 0:
        return np.array([], np.int64)
    # adjacent pair dedup on (okey, supp): rows are sorted by k
    keep = np.ones(len(okey), dtype=bool)
    keep[1:] = (okey[1:] != okey[:-1]) | (supp[1:] != supp[:-1])
    first = np.flatnonzero(keep)
    tsd = np.maximum.reduceat(ts, first)
    okd, spd = okey[first], supp[first]
    seg = np.flatnonzero(np.concatenate([[True], okd[1:] != okd[:-1]]))
    seg_len = np.diff(np.append(seg, len(okd)))
    has_order = spd[seg] == -1
    nsupp = seg_len - has_order.astype(np.int64)
    odate = np.where(has_order, tsd[seg], np.int64(0))
    late = (
        (tsd > np.repeat(odate + late_us, seg_len)) & (spd != -1)
    ).astype(np.int64)
    nlate = np.add.reduceat(late, seg)
    sole = np.add.reduceat(late * spd, seg)
    hit = has_order & (nsupp > 1) & (nlate == 1)
    return sole[hit]


def q_late_sole_supplier(sf_dir: str):
    """Q21 shape: top suppliers solely responsible for lateness in finished
    multi-supplier orders (single-sort sort-merge join, boundary-safe fold)."""
    import pyarrow.parquet as pq
    import ray.data

    late_us = Q21_LATE_DAYS * _US_PER_DAY

    def orders_side(batch: pa.Table) -> pa.Table:
        status = (
            batch.column("o_orderstatus").to_numpy(zero_copy_only=False)
            .astype(str)
        )
        keep = status == "F"
        okey = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        if len(okey) and int(okey.max()) >= _Q21_OKEY_CAP:
            raise ValueError(
                "rel_late_sole_supplier: orderkey exceeds the sort-merge "
                "key split (Q21_SUPP_BITS); widen the split"
            )
        od = (
            batch.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)[keep]
        )
        return pa.table(
            {"k": pa.array(okey << Q21_SUPP_BITS, pa.int64()),
             "suppkey": pa.array(np.full(len(okey), -1, np.int64),
                                 pa.int64()),
             "ts": pa.array(od, pa.int64())}
        )

    def block_fold(t: pa.Table) -> pa.Table:
        """Sorted block -> per-supplier blame partials for INTERIOR order
        segments; the first/last segments' raw rows go to the side-channel
        (sk = okey >= 0) for the exactly-once driver fold."""
        if t.num_rows == 0:
            return pa.table(
                {"sk": pa.array([], pa.int64()),
                 "ssupp": pa.array([], pa.int64()),
                 "sts": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        k = t.column("k").to_numpy(zero_copy_only=False)
        supp = t.column("suppkey").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        okey = k >> Q21_SUPP_BITS
        seg = np.flatnonzero(np.concatenate([[True], okey[1:] != okey[:-1]]))
        lo = seg[1] if len(seg) > 1 else len(okey)  # end of first segment
        hi = seg[-1] if len(seg) > 2 else lo        # start of last segment
        side = np.concatenate([np.arange(0, lo), np.arange(hi, len(okey))])
        cols = {
            "sk": okey[side], "ssupp": supp[side], "sts": ts[side],
            "n": np.zeros(len(side), np.int64),
        }
        blamed = _q21_fold_segments(
            okey[lo:hi], supp[lo:hi], ts[lo:hi], late_us
        )
        if len(blamed):
            u, c = np.unique(blamed, return_counts=True)
            cols = {
                "sk": np.concatenate([cols["sk"], np.full(len(u), -1)]),
                "ssupp": np.concatenate([cols["ssupp"], u]),
                "sts": np.concatenate([cols["sts"], np.zeros(len(u),
                                                             np.int64)]),
                "n": np.concatenate([cols["n"], c.astype(np.int64)]),
            }
        return pa.table(
            {"sk": pa.array(cols["sk"], pa.int64()),
             "ssupp": pa.array(cols["ssupp"], pa.int64()),
             "sts": pa.array(cols["sts"], pa.int64()),
             "n": pa.array(cols["n"], pa.int64())}
        )

    pairs = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(_q21_pair_partials, batch_format="pyarrow",
                  **remote_kwargs())
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).map_batches(orders_side, batch_format="pyarrow", **remote_kwargs())
    # batch_size=None: one batch per sorted block, so the fold sees whole
    # partitions (the boundary side-channel covers Ray's block re-splits)
    df = (
        pairs.union(orders)
        .sort("k")
        .map_batches(block_fold, batch_format="pyarrow", batch_size=None,
                     **remote_kwargs())
        .to_pandas()
    )
    # driver fold: blame partials (<= |supplier| x blocks rows) + the
    # side-channel (<= 2 segments x segment size x blocks rows) — both
    # dimension/block-bounded, never fact-scale
    blame: dict[int, int] = {}
    if len(df):
        bp = df[df["sk"] < 0]
        for s, n in zip(bp["ssupp"].to_numpy(np.int64),
                        bp["n"].to_numpy(np.int64)):
            blame[int(s)] = blame.get(int(s), 0) + int(n)
        side = df[df["sk"] >= 0]
        if len(side):
            sk = side["sk"].to_numpy(np.int64)
            ss = side["ssupp"].to_numpy(np.int64)
            st = side["sts"].to_numpy(np.int64)
            order = np.lexsort((ss, sk))
            for s in _q21_fold_segments(
                sk[order], ss[order], st[order], late_us
            ):
                blame[int(s)] = blame.get(int(s), 0) + 1
    if not blame:
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "numwait": pa.array([], pa.int64())}
        )
    import pandas as pd

    df = pd.DataFrame(
        {"s_suppkey": list(blame.keys()), "numwait": list(blame.values())}
    ).sort_values(
        ["numwait", "s_suppkey"], ascending=[False, True], kind="stable"
    ).head(TOPK_SUPPLIERS).reset_index(drop=True)
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sk, kind="stable")
    sk_s = sk[order]
    sname = np.asarray(sup.column("s_name").to_pylist(), dtype=object)[order]
    probe = df["s_suppkey"].to_numpy(np.int64)
    pos = np.minimum(np.searchsorted(sk_s, probe), max(len(sk_s) - 1, 0))
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["s_name"] = sname[pos].astype(str)
    return pa.Table.from_pandas(
        df[["rank", "s_suppkey", "s_name", "numwait"]], preserve_index=False
    )


_Q21_SQL = f"""
WITH pairs AS (
  SELECT l_orderkey AS o_orderkey, l_suppkey,
         epoch_us(max(l_shipdate)) AS max_ship_us
  FROM lineitem GROUP BY 1, 2),
j AS (
  SELECT p.o_orderkey, p.l_suppkey,
         CASE WHEN p.max_ship_us > epoch_us(o.o_orderdate)
                   + {Q21_LATE_DAYS}::BIGINT * 86400000000 THEN 1 ELSE 0 END
           AS late
  FROM pairs p JOIN orders o ON p.o_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'),
f AS (
  SELECT o_orderkey, count(*) AS nsupp, sum(late) AS nlate,
         CAST(sum(late * l_suppkey) AS BIGINT) AS late_supp
  FROM j GROUP BY 1
  HAVING count(*) > 1 AND sum(late) = 1),
b AS (
  SELECT late_supp AS s_suppkey, count(*) AS numwait FROM f GROUP BY 1)
SELECT row_number() OVER (ORDER BY b.numwait DESC, b.s_suppkey) AS rank,
       b.s_suppkey, s.s_name, b.numwait
FROM b JOIN supplier s ON b.s_suppkey = s.s_suppkey
ORDER BY b.numwait DESC, b.s_suppkey
LIMIT {TOPK_SUPPLIERS}
"""


register("rel_priority_backlog", q_priority_backlog, _Q4_SQL)
register("rel_shipstatus_priority", q_shipstatus_priority, _Q12_SQL)
register("rel_nation_volume", q_nation_volume, _Q7_SQL)
register("rel_market_share", q_market_share, _Q8_SQL)
register("rel_small_qty_revenue", q_small_qty_revenue, _Q17_SQL)
register("rel_bracket_revenue", q_bracket_revenue, _Q19_SQL)
register("rel_late_sole_supplier", q_late_sole_supplier, _Q21_SQL)


# ---------------------------------------------------------------------------
# Q2-shape: argmin-per-group with attribute carry — the cheapest supplier
# per part. The testdata has no partsupp table, so the min-cost relation is
# lineitem itself: per l_partkey, the supplier row with the MINIMUM
# l_extendedprice (ties -> lowest l_suppkey), joined back to supplier and
# nation names. The distributed shape the first tranche lacks: a two-phase
# ARGMIN where the "arg" (suppkey) must ride along with the min — done by
# encoding (price_c, suppkey) into ONE int64 so the lexicographic minimum
# IS an integer Min aggregate: per-block sort + minimum.reduceat partials,
# then a tiny groupby-min over combiner output (#parts rows per block, not
# fact rows), then broadcast dimension resolve. No fact row ever shuffles.
#
# Encoding bound (asserted): price_c < 2^31 (l_extendedprice < ~$21.4M) and
# suppkey < 2^32, so combined = price_c << 32 | suppkey stays inside int64.
# ---------------------------------------------------------------------------


def q_cheapest_supplier(sf_dir: str):
    """(l_partkey, l_suppkey, s_name, n_name, min_price): the argmin row of
    each part's lineitem group, attributes resolved via broadcast."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Min

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    s_order = np.argsort(sk, kind="stable")
    sk = sk[s_order]
    s_names = np.asarray(sup.column("s_name").to_pylist(), dtype=object)[s_order]
    s_nk = (
        sup.column("s_nationkey").to_numpy(zero_copy_only=False)
        .astype(np.int64)[s_order]
    )
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    n_order = np.argsort(nk, kind="stable")
    nk = nk[n_order]
    n_names = np.asarray(nat.column("n_name").to_pylist(), dtype=object)[n_order]
    dim_ref = ray.put((sk, s_names, s_nk, nk, n_names))

    def partials(batch: pa.Table) -> pa.Table:
        part = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        supp = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price_c = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        if len(part) == 0:
            return pa.table(
                {"l_partkey": pa.array([], pa.int64()),
                 "comb": pa.array([], pa.int64())}
            )
        if price_c.max() >= (1 << 31) or supp.max() >= (1 << 32):
            raise ValueError(
                "argmin encoding bound exceeded: l_extendedprice*100 must be"
                " < 2^31 and l_suppkey < 2^32 (widen the encoding to two"
                " Min aggregates if the corpus outgrows this)"
            )
        comb = (price_c << 32) | supp
        order = np.argsort(part, kind="stable")
        ps, cs = part[order], comb[order]
        uniq, first = np.unique(ps, return_index=True)
        return pa.table(
            {
                "l_partkey": pa.array(uniq, pa.int64()),
                "comb": pa.array(np.minimum.reduceat(cs, first), pa.int64()),
            }
        )

    def resolve(batch: pa.Table) -> pa.Table:
        sk, s_names, s_nk, nk, n_names = ray.get(dim_ref)
        part = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        comb = batch.column("min(comb)").to_numpy(zero_copy_only=False)
        comb = comb.astype(np.int64)
        supp = comb & ((1 << 32) - 1)
        price_c = comb >> 32
        spos = np.minimum(np.searchsorted(sk, supp), len(sk) - 1)
        sname = s_names[spos]
        nation_key = s_nk[spos]
        npos = np.minimum(np.searchsorted(nk, nation_key), len(nk) - 1)
        return pa.table(
            {
                "l_partkey": pa.array(part, pa.int64()),
                "l_suppkey": pa.array(supp, pa.int64()),
                "s_name": pa.array(sname.astype(str), pa.string()),
                "n_name": pa.array(n_names[npos].astype(str), pa.string()),
                "min_price": pa.array(
                    np.round(price_c / 100.0, 6), pa.float64()
                ),
            }
        )

    df = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        # big batches: the combiner emits <= #parts rows per BATCH, so the
        # exchange entering the groupby shrinks linearly with batch size
        # (139 x 20k partials -> 24 x 20k at 10x TPC-H; 3 int64 cols x 256k
        # rows is a 6 MB batch)
        .map_batches(partials, batch_format="pyarrow", batch_size=262_144,
                     **remote_kwargs())
        .groupby("l_partkey")
        .aggregate(Min("comb"))
        .map_batches(resolve, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    df = df.sort_values("l_partkey").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["l_partkey", "l_suppkey", "s_name", "n_name", "min_price"]],
        preserve_index=False,
    )


_Q2_SQL = """
WITH l AS (
  SELECT l_partkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem),
m AS (SELECT l_partkey, min(price_c) AS min_pc FROM l GROUP BY 1),
w AS (
  SELECT l.l_partkey, min(l.l_suppkey) AS l_suppkey, m.min_pc
  FROM l JOIN m ON l.l_partkey = m.l_partkey AND l.price_c = m.min_pc
  GROUP BY 1, 3)
SELECT w.l_partkey, w.l_suppkey, s.s_name, n.n_name,
       round(w.min_pc / 100.0, 6) AS min_price
FROM w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY 1
"""

register("rel_cheapest_supplier", q_cheapest_supplier, _Q2_SQL)
