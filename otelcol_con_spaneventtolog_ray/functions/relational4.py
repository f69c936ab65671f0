"""Fourth relational tranche — the two classic nested-aggregate shapes the
first three tranches don't exercise:

* Q11 ("important stock") — a grouped sum filtered against a GLOBAL
  aggregate of the same grouped sums: keep parts whose lineitem revenue
  exceeds 1.2x the mean per-part revenue. The classic Q11 uses a fixed
  global fraction, whose selectivity collapses as the part count grows
  with scale factor; comparing against the mean (val * n_parts * 10 >
  total * 12, exact integer cross-multiply) keeps the same
  two-level-aggregate shape with scale-free selectivity.
* Q20 ("excess availability" suppliers) — a nested semi-join gated by a
  grouped-sum HAVING: suppliers whose shipped quantity of name-matched
  parts inside a date window exceeds a fixed threshold, resolved to
  (name, nation) through the supplier dimension.

100-TB notes (both queries): lineitem never shuffles raw — each block
pre-reduces to (key, sum) combiner rows before the single dimension-keyed
groupby; the part-name filter ships as a sorted partkey array via ray.put
(membership test is a searchsorted, no join); the grouped result is
dimension-sized (|part| / |supplier| rows) so the global-total fold and
the supplier-name resolve run driver-side over a dimension table, exactly
like the 25-nation outputs in relational.py. Q11's threshold compare runs
in Python-int (object-dtype) arithmetic, exact at any magnitude — no
int64 overflow cliff when total revenue crosses 2^63/12.

The reference (connector.go) has no relational engine; parity is pinned
against the DuckDB mirrors only (see relational.py module docstring).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .entry_queries import register
from ..rayenv import remote_kwargs
from .relutil import _lookup_int, _read

# deferred module binding (attribute access at call time) — same pattern as
# relational3.py: relational2 is mid-init when entry_queries imports us.
from . import relational2 as _r2

# Q11 shape: keep parts with revenue > (Q11_NUM/Q11_DEN) x mean per-part
Q11_NUM = 12
Q11_DEN = 10

# Q20 shape constants
Q20_NAME_SUBSTR = "red"
Q20_SHIP_FROM = "1997-01-01"
Q20_SHIP_TO = "1998-01-01"  # exclusive
Q20_MIN_QTY = 300  # strict >


def q_important_parts(sf_dir: str):
    """Q11 shape: parts whose total lineitem revenue exceeds 1.2x the mean
    per-part revenue. Columns: p_partkey, value (dollars, 6dp)."""
    from ray.data.aggregate import Sum

    from .blockutil import retype_block

    def partials(batch: pa.Table) -> pa.Table:
        pk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        (gpk,), gv, _ = _r2._group_sum_int([pk], {"val_cc": _r2._money_cc(batch)})
        return pa.table(
            {"p_partkey": pa.array(gpk, pa.int64()),
             "val_cc": pa.array(gv["val_cc"], pa.int64())}
        )

    df = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("p_partkey")
        .aggregate(Sum("val_cc", alias_name="val_cc"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"p_partkey": ("p_partkey", pa.int64()),
                 "val_cc": ("val_cc", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()  # dimension-sized: one row per part
    )
    if len(df) == 0:
        return pa.table(
            {"p_partkey": pa.array([], pa.int64()),
             "value": pa.array([], pa.float64())}
        )
    # exact threshold compare in Python-int space: val*n*DEN > total*NUM
    vals = df["val_cc"].to_numpy().astype(object)
    total = int(df["val_cc"].sum())
    n_parts = len(df)
    keep = vals * (n_parts * Q11_DEN) > total * Q11_NUM
    df = df[keep.astype(bool)].copy()
    df["value"] = (df["val_cc"] / 10000.0).round(6)
    df = df.sort_values(
        ["value", "p_partkey"], ascending=[False, True]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["p_partkey", "value"]], preserve_index=False
    )


_Q11_SQL = f"""
WITH v AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS val_cc
  FROM lineitem GROUP BY 1),
t AS (SELECT sum(val_cc) AS tot, count(*) AS np FROM v)
SELECT v.p_partkey, round(v.val_cc / 10000.0, 6) AS value
FROM v, t
WHERE v.val_cc * t.np * {Q11_DEN} > t.tot * {Q11_NUM}
ORDER BY value DESC, p_partkey
"""

register("rel_important_parts", q_important_parts, _Q11_SQL)


def _q20_part_keys(sf_dir: str) -> np.ndarray:
    """Sorted partkeys whose name matches — the broadcast semi-join probe."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    mask = pc.match_substring(part.column("p_name"), Q20_NAME_SUBSTR)
    k = (
        part.filter(mask).column("p_partkey")
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )
    return np.sort(k)


def q_heavy_shippers(sf_dir: str):
    """Q20 shape: suppliers that shipped > Q20_MIN_QTY units of name-matched
    parts inside the window. Columns: s_name, nation, qty; ordered by s_name."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from .blockutil import retype_block

    pk_ref = ray.put(_q20_part_keys(sf_dir))
    lo = np.datetime64(Q20_SHIP_FROM)
    hi = np.datetime64(Q20_SHIP_TO)

    def partials(batch: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        partk = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = (ship >= lo) & (ship < hi) & (_lookup_int(pk, pk, partk) >= 0)
        if not keep.any():
            return pa.table(
                {"s_suppkey": pa.array([], pa.int64()),
                 "qty": pa.array([], pa.int64())}
            )
        sk = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        qty = np.rint(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        (gsk,), gv, _ = _r2._group_sum_int([sk], {"qty": qty})
        return pa.table(
            {"s_suppkey": pa.array(gsk, pa.int64()),
             "qty": pa.array(gv["qty"], pa.int64())}
        )

    df = (
        _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        .map_batches(partials, batch_format="pyarrow", **remote_kwargs())
        .groupby("s_suppkey")
        .aggregate(Sum("qty", alias_name="qty"))
        .map_batches(
            lambda t: retype_block(
                t,
                {"s_suppkey": ("s_suppkey", pa.int64()),
                 "qty": ("qty", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()  # dimension-sized: one row per qualifying supplier
    )
    df = df[df["qty"] > Q20_MIN_QTY]
    if len(df) == 0:
        return pa.table(
            {"s_name": pa.array([], pa.string()),
             "nation": pa.array([], pa.string()),
             "qty": pa.array([], pa.int64())}
        )
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).to_pandas()
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    df = df.merge(sup, on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    df = df.rename(columns={"n_name": "nation"})
    df = df.sort_values("s_name").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["s_name", "nation", "qty"]], preserve_index=False
    )


_Q20_SQL = f"""
SELECT s.s_name AS s_name, n.n_name AS nation, CAST(q.qty AS BIGINT) AS qty
FROM (
  SELECT l_suppkey, sum(CAST(round(l_quantity) AS BIGINT)) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{Q20_NAME_SUBSTR}%'
    AND l_shipdate >= DATE '{Q20_SHIP_FROM}'
    AND l_shipdate < DATE '{Q20_SHIP_TO}'
  GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {Q20_MIN_QTY}
) q
JOIN supplier s ON q.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY s_name
"""

register("rel_heavy_shippers", q_heavy_shippers, _Q20_SQL)
