"""Scale-stress for the round-4 session ops: exact grouped quantiles at 10M
rows / ~10M distinct values, and the anti/semi/Q5 joins at 10x TPC-H volume
(1.5M orders / 6M line items / 1M customers). Inputs are deterministic
replications of /root/testdata/sf0.1 written under /tmp; walls print as one
JSON line for BASELINE.md.

Usage: python tools/stress_round4.py [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/graft_stress_r4"


def _build_events(reps: int = 100) -> str:
    """10M events; values perturbed per replica by a micro offset so the
    distinct-value count scales with the data (the honest quantile stress —
    a pure replication would leave the distribution table at sf0.1 size)."""
    d = os.path.join(OUT, "events10m")
    marker = os.path.join(d, ".done")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    parts = os.path.join(d, "events.parquet")  # dir-of-parts layout
    os.makedirs(parts)
    t = pq.read_table(os.path.join(SF, "events.parquet"))
    val = t.column("value").to_numpy(zero_copy_only=False)
    for r in range(reps):
        t2 = t.set_column(
            t.schema.get_field_index("value"), "value",
            pa.array(val + r * 1e-6, pa.float64()),
        )
        pq.write_table(t2, os.path.join(parts, f"part-{r:03d}.parquet"))
    open(marker, "w").close()
    return d


def _build_tpch(reps: int = 10) -> str:
    """10x orders/lineitem/customer with offset keys (1.5M orders, 6M line
    items, 150k customers per replica -> 1.5M customers total); nation /
    supplier / region copied as-is."""
    d = os.path.join(OUT, "tpch10x")
    marker = os.path.join(d, ".done")
    if os.path.exists(marker):
        # backfill `part` into caches built before it joined the copy list
        if not os.path.exists(os.path.join(d, "part.parquet")):
            shutil.copy(os.path.join(SF, "part.parquet"),
                        os.path.join(d, "part.parquet"))
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    orders = pq.read_table(os.path.join(SF, "orders.parquet"))
    li = pq.read_table(os.path.join(SF, "lineitem.parquet"))
    cust = pq.read_table(os.path.join(SF, "customer.parquet"))
    okey = orders.column("o_orderkey").to_numpy(zero_copy_only=False)
    ocust = orders.column("o_custkey").to_numpy(zero_copy_only=False)
    lkey = li.column("l_orderkey").to_numpy(zero_copy_only=False)
    ckey = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    KO = int(okey.max()) + 1
    KC = int(ckey.max()) + 1
    o_parts, l_parts, c_parts = [], [], []
    for r in range(reps):
        o = orders.set_column(
            orders.schema.get_field_index("o_orderkey"), "o_orderkey",
            pa.array(okey + r * KO, pa.int64()),
        )
        o = o.set_column(
            o.schema.get_field_index("o_custkey"), "o_custkey",
            pa.array(ocust + r * KC, pa.int64()),
        )
        o_parts.append(o)
        l_parts.append(li.set_column(
            li.schema.get_field_index("l_orderkey"), "l_orderkey",
            pa.array(lkey + r * KO, pa.int64()),
        ))
        c_parts.append(cust.set_column(
            cust.schema.get_field_index("c_custkey"), "c_custkey",
            pa.array(ckey + r * KC, pa.int64()),
        ))
    pq.write_table(pa.concat_tables(o_parts), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.concat_tables(l_parts), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.concat_tables(c_parts), os.path.join(d, "customer.parquet"))
    for t in ("nation", "region", "supplier", "part"):
        shutil.copy(os.path.join(SF, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    open(marker, "w").close()
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    ev_dir = _build_events()
    tp_dir = _build_tpch()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)
    from otelcol_con_spaneventtolog_ray.functions import quantiles as Q
    from otelcol_con_spaneventtolog_ray.functions import relational as R
    from otelcol_con_spaneventtolog_ray.functions import relational2 as R2
    from otelcol_con_spaneventtolog_ray.functions import relational3 as R3
    from otelcol_con_spaneventtolog_ray.functions import relational4 as R4

    walls: dict[str, float] = {}
    extra: dict[str, int] = {}

    # events quantiles on a dir of parquet (read_parquet takes the dir)
    t0 = time.perf_counter()
    out = Q.q_events_value_quantiles_exact(ev_dir)
    walls["events_value_quantiles_exact_10m"] = round(
        time.perf_counter() - t0, 2
    )
    extra["quantile_groups"] = out.num_rows
    extra["quantile_n_total"] = int(
        sum(out.column("n").to_pylist())
    )

    for name, fn in (
        ("rel_churned_customers_10x", R.q_churned_customers),
        ("rel_orders_with_returns_10x", R.q_orders_with_returns),
        ("rel_local_supply_revenue_10x", R.q_local_supply_revenue),
        ("rel_revenue_rollup_10x", R.q_revenue_rollup),
        ("rel_orders_pivot_10x", R.q_orders_pivot),
        ("rel_promo_revenue_10x", R.q_promo_revenue),
        ("rel_top_suppliers_10x", R.q_top_suppliers),
        ("rel_big_orders_10x", R.q_big_orders),
        ("rel_idle_rich_customers_10x", R.q_idle_rich_customers),
        ("rel_part_type_suppliers_10x", R.q_part_type_suppliers),
        ("rel_priority_backlog_10x", R2.q_priority_backlog),
        ("rel_shipstatus_priority_10x", R2.q_shipstatus_priority),
        ("rel_nation_volume_10x", R2.q_nation_volume),
        ("rel_market_share_10x", R2.q_market_share),
        ("rel_small_qty_revenue_10x", R2.q_small_qty_revenue),
        ("rel_bracket_revenue_10x", R2.q_bracket_revenue),
        ("rel_late_sole_supplier_10x", R2.q_late_sole_supplier),
        ("rel_cheapest_supplier_10x", R2.q_cheapest_supplier),
        ("rel_profit_by_nation_year_10x", R3.q_profit_by_nation_year),
        ("rel_ship_latency_quantiles_10x", R3.q_ship_latency_quantiles),
        ("rel_important_parts_10x", R4.q_important_parts),
        ("rel_heavy_shippers_10x", R4.q_heavy_shippers),
    ):
        t0 = time.perf_counter()
        res = fn(tp_dir)
        walls[name] = round(time.perf_counter() - t0, 2)
        extra[name + "_rows"] = res.num_rows

    # window-function trio at 10M events: per-EVENT output cardinality, so
    # consume distributed (count executes the DAG without driver collect)
    from otelcol_con_spaneventtolog_ray.functions import eventops as E

    t0 = time.perf_counter()
    n = E.q_window_functions(ev_dir).count()
    walls["events_window_functions_10m"] = round(time.perf_counter() - t0, 2)
    extra["window_rows"] = int(n)

    # growth accounting at 10M events (150 users x 100 replicas share ids,
    # so the first-seen fold collapses 10M rows to 150 users)
    t0 = time.perf_counter()
    nu = E.q_new_users_daily(ev_dir)
    walls["events_new_users_daily_10m"] = round(time.perf_counter() - t0, 2)
    extra["new_users_days"] = nu.num_rows

    print(json.dumps(
        {"metric": "round4 stress walls sec", "queries": walls,
         "detail": extra, "num_cpus": args.cpus}
    ))
    ray.shutdown()


if __name__ == "__main__":
    main()
