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
from ..rayenv import remote_kwargs

#: Q1-style cutoff (inclusive): inside the data's 1995-2001 span so the
#: filter actually prunes rows
PRICING_CUTOFF = "1999-12-31"


def _read(sf_dir: str, table: str, columns):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=list(columns)
    )


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


register("rel_pricing_summary", q_pricing_summary, _PRICING_SQL)
register("rel_revenue_by_nation", q_revenue_by_nation, _REVENUE_SQL)
