"""Edge and property tests for the round-4 anti/semi-join and exact
grouped-quantile operators (the SQL-parity runs live in test_functions.py's
SQL_CHECKED sweep; these pin the contracts the sweep can't reach: the rank
formula itself, the bounded-group fail-fast, and the empty-result paths)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_entry_queries import _to_df


def _write(dirpath, name, table):
    pq.write_table(table, str(dirpath / f"{name}.parquet"))


# ---------------------------------------------------------------------------
# quantile rank contract — pure functions, no Ray needed
# ---------------------------------------------------------------------------


def test_quantile_selection_matches_numpy_order_statistics():
    from otelcol_con_spaneventtolog_ray.functions.quantiles import (
        PCTS,
        _dist_partials,
        _select_quantiles,
    )

    rng = np.random.default_rng(7)
    vals = rng.integers(-1000, 1000, size=5000).astype(np.int64)
    key = np.array(["k"] * len(vals))
    dist = _dist_partials(key, vals, "lang")
    row = _select_quantiles(dist, "lang").to_pylist()[0]
    s = np.sort(vals)
    n = len(s)
    assert row["n"] == n
    for p in PCTS:
        assert row[f"p{p}"] == s[((n - 1) * p) // 100], p


def test_quantile_selection_heavy_ties_single_value():
    from otelcol_con_spaneventtolog_ray.functions.quantiles import (
        PCTS,
        _dist_partials,
        _select_quantiles,
    )

    # one distinct value repeated: every percentile IS that value and the
    # distribution table is a single row regardless of input size
    vals = np.full(100_000, 42, dtype=np.int64)
    key = np.array(["k"] * len(vals))
    dist = _dist_partials(key, vals, "lang")
    assert dist.num_rows == 1  # the compression the scale path relies on
    row = _select_quantiles(dist, "lang").to_pylist()[0]
    assert row["n"] == 100_000
    for p in PCTS:
        assert row[f"p{p}"] == 42


def test_quantile_group_cap_fails_fast(monkeypatch):
    from otelcol_con_spaneventtolog_ray.functions import quantiles as Q

    monkeypatch.setattr(Q, "QUANTILE_MAX_GROUP", 10)
    dist = pa.table(
        {"lang": pa.array(["x"] * 11, pa.string()),
         "v": pa.array(np.arange(11), pa.int64()),
         "cnt": pa.array([1] * 11, pa.int64())}
    )
    with pytest.raises(ValueError, match="sketch_value_quantiles"):
        Q._select_quantiles(dist, "lang")


def test_dist_partials_compress_per_block():
    from otelcol_con_spaneventtolog_ray.functions.quantiles import (
        _dist_partials,
    )

    key = np.array(["a", "b", "a", "b", "a"])
    v = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    t = _dist_partials(key, v, "k").to_pylist()
    assert t == [
        {"k": "a", "v": 1, "cnt": 2},
        {"k": "a", "v": 2, "cnt": 1},
        {"k": "b", "v": 1, "cnt": 1},
        {"k": "b", "v": 2, "cnt": 1},
    ]


def test_weighted_sample_prefers_heavy_docs(ray_session):
    """Importance-sampling semantics: the kept set's mean weight must exceed
    the corpus mean (keep probability is proportional to n_chars)."""
    import pyarrow.parquet as pq_mod

    from otelcol_con_spaneventtolog_ray.functions.textstats import (
        q_sample_weighted,
    )

    sf = "/root/testdata/sf0.001"
    kept = _to_df(q_sample_weighted(sf))
    all_docs = pq_mod.read_table(
        f"{sf}/documents.parquet", columns=["n_chars"]
    ).to_pandas()
    assert 0 < len(kept) < len(all_docs)
    assert kept["n_chars"].mean() > all_docs["n_chars"].mean()


def test_above_median_keeps_at_least_half_per_lang(ray_session):
    """>= median keeps ceil(n/2) .. n rows of each language (ties at the
    median can push the kept count above half, never below)."""
    import duckdb

    from otelcol_con_spaneventtolog_ray.functions.quantiles import (
        q_above_median_length,
    )

    sf = "/root/testdata/sf0.001"
    out = _to_df(q_above_median_length(sf))
    totals = dict(
        duckdb.sql(
            f"SELECT lang, count(*) FROM '{sf}/documents.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert set(out["lang"]) == set(totals)
    for _, row in out.iterrows():
        n = totals[row["lang"]]
        assert (n + 1) // 2 <= row["n_kept"] <= n


def test_rollup_levels_are_internally_consistent(ray_session):
    """The (nation) level must equal the sum of its (nation, year) rows and
    the grand total must equal the sum of the nation level — the invariant
    that defines a rollup."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_revenue_rollup,
    )

    df = _to_df(q_revenue_rollup("/root/testdata/sf0.001"))
    fine = df[df["lvl"] == 2]
    mid = df[df["lvl"] == 1].set_index("nation")
    top = df[df["lvl"] == 0]
    assert len(top) == 1 and top.iloc[0]["nation"] == "ALL"
    for nation, grp in fine.groupby("nation"):
        assert mid.loc[nation, "n_orders"] == grp["n_orders"].sum()
        assert abs(mid.loc[nation, "revenue"] - grp["revenue"].sum()) < 1e-6
    assert top.iloc[0]["n_orders"] == mid["n_orders"].sum()


def test_pivot_cells_sum_to_order_count(ray_session):
    import duckdb

    from otelcol_con_spaneventtolog_ray.functions.relational import (
        _PIVOT_COLS,
        q_orders_pivot,
    )

    sf = "/root/testdata/sf0.001"
    df = _to_df(q_orders_pivot(sf))
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/orders.parquet'"
    ).fetchone()[0]
    assert df[_PIVOT_COLS].to_numpy().sum() == total
    assert df["month"].is_monotonic_increasing


# ---------------------------------------------------------------------------
# anti/semi-join empty-result and sentinel paths (Ray)
# ---------------------------------------------------------------------------


def test_churned_customers_empty_when_all_active(ray_session, tmp_path):
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_churned_customers,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([1, 2, 3], pa.int64()),
         "c_mktsegment": pa.array(["A", "B", "A"], pa.string()),
         "c_acctbal": pa.array([10.0, 20.0, 30.0], pa.float64())}
    ))
    # every customer ordered after the churn cutoff
    _write(d, "orders", pa.table(
        {"o_custkey": pa.array([1, 2, 3], pa.int64()),
         "o_orderdate": pa.array(
             [pd.Timestamp("2001-01-01")] * 3,
             pa.timestamp("us"),
         )}
    ))
    out = _to_df(q_churned_customers(str(d)))
    assert len(out) == 0
    assert list(out.columns) == ["c_mktsegment", "n_customers",
                                 "total_acctbal"]


def test_churned_customers_finds_only_stale(ray_session, tmp_path):
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_churned_customers,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
         "c_mktsegment": pa.array(["A", "B", "A", "B"], pa.string()),
         "c_acctbal": pa.array([10.5, 20.25, 30.0, 40.0], pa.float64())}
    ))
    # 1 ordered recently; 2 only before the cutoff; 3 never ordered;
    # 4 ordered recently
    _write(d, "orders", pa.table(
        {"o_custkey": pa.array([1, 2, 4], pa.int64()),
         "o_orderdate": pa.array(
             [pd.Timestamp("2001-01-01"), pd.Timestamp("1999-06-01"),
              pd.Timestamp("2000-02-03")],
             pa.timestamp("us"),
         )}
    ))
    out = _to_df(q_churned_customers(str(d)))
    assert out.to_dict("records") == [
        {"c_mktsegment": "A", "n_customers": 1, "total_acctbal": 30.0},
        {"c_mktsegment": "B", "n_customers": 1, "total_acctbal": 20.25},
    ]


def test_orders_with_returns_semi_join_keeps_each_order_once(
    ray_session, tmp_path
):
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_orders_with_returns,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "orders", pa.table(
        {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
         "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "1-URGENT"],
                                     pa.string()),
         "o_totalprice": pa.array([100.0, 200.0, 300.0], pa.float64())}
    ))
    # order 1 has TWO returned lines (must still count once); order 2 has
    # none; order 3 has one
    _write(d, "lineitem", pa.table(
        {"l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
         "l_returnflag": pa.array(["R", "R", "N", "R"], pa.string())}
    ))
    out = _to_df(q_orders_with_returns(str(d)))
    assert out.to_dict("records") == [
        {"o_orderpriority": "1-URGENT", "n_orders": 2, "total_value": 400.0},
    ]


def test_local_supply_revenue_requires_nation_match(ray_session, tmp_path):
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_local_supply_revenue,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "region", pa.table(
        {"r_regionkey": pa.array([0, 1], pa.int32()),
         "r_name": pa.array(["ASIA", "EUROPE"], pa.string())}
    ))
    _write(d, "nation", pa.table(
        {"n_nationkey": pa.array([10, 11], pa.int32()),
         "n_name": pa.array(["N_ASIA", "N_EU"], pa.string()),
         "n_regionkey": pa.array([0, 1], pa.int32())}
    ))
    _write(d, "supplier", pa.table(
        {"s_suppkey": pa.array([1, 2], pa.int64()),
         "s_nationkey": pa.array([10, 11], pa.int32())}
    ))
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([5, 6], pa.int64()),
         "c_nationkey": pa.array([10, 11], pa.int32())}
    ))
    _write(d, "orders", pa.table(
        {"o_orderkey": pa.array([100, 101], pa.int64()),
         "o_custkey": pa.array([5, 6], pa.int64()),
         "o_orderdate": pa.array(
             [pd.Timestamp("1997-06-01")] * 2, pa.timestamp("us")
         )}
    ))
    # line 1: supplier 1 (ASIA) on order 100 (customer 5, same nation) ✓
    # line 2: supplier 2 (EU) on order 100 (customer 5, ASIA) — nation
    #   mismatch, dropped
    # line 3: supplier 2 (EU) on order 101 (customer 6, EU) — matches but
    #   outside the ASIA region filter
    _write(d, "lineitem", pa.table(
        {"l_orderkey": pa.array([100, 100, 101], pa.int64()),
         "l_suppkey": pa.array([1, 2, 2], pa.int64()),
         "l_extendedprice": pa.array([1000.0, 500.0, 700.0], pa.float64()),
         "l_discount": pa.array([0.10, 0.0, 0.0], pa.float64())}
    ))
    out = _to_df(q_local_supply_revenue(str(d)))
    assert out.to_dict("records") == [{"nation": "N_ASIA", "revenue": 900.0}]


def test_order_distribution_outer_join_counts_zero_order_customers(
    ray_session, tmp_path
):
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_customer_order_distribution,
    )

    d = tmp_path / "sf"
    d.mkdir()
    # customers 1,2 never ordered (0-bucket); 3 ordered once; 4 three times
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}
    ))
    _write(d, "orders", pa.table(
        {"o_custkey": pa.array([3, 4, 4, 4], pa.int64())}
    ))
    out = _to_df(q_customer_order_distribution(str(d)))
    assert out.to_dict("records") == [
        {"n_orders": 0, "n_customers": 2},
        {"n_orders": 1, "n_customers": 1},
        {"n_orders": 3, "n_customers": 1},
    ]


def test_order_distribution_all_customers_ordered(ray_session, tmp_path):
    """No 0-bucket when every customer has an order — and orders by
    customers missing from the customer table (referential noise) must not
    invent rows (LEFT outer, not full outer)."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_customer_order_distribution,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([1, 2], pa.int64())}
    ))
    _write(d, "orders", pa.table(
        {"o_custkey": pa.array([1, 2, 2, 99], pa.int64())}
    ))
    out = _to_df(q_customer_order_distribution(str(d)))
    assert out.to_dict("records") == [
        {"n_orders": 1, "n_customers": 1},
        {"n_orders": 2, "n_customers": 1},
    ]


# ---------------------------------------------------------------------------
# Q18 / Q22 / Q16 shapes — planted and empty-result paths
# ---------------------------------------------------------------------------


def test_big_orders_empty_when_none_exceed_threshold(ray_session, tmp_path):
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_big_orders,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "lineitem", pa.table(
        {"l_orderkey": pa.array([1, 1, 2], pa.int64()),
         "l_quantity": pa.array([10.0, 20.0, 5.0], pa.float64())}
    ))
    _write(d, "orders", pa.table(
        {"o_orderkey": pa.array([1, 2], pa.int64()),
         "o_custkey": pa.array([7, 8], pa.int64()),
         "o_orderdate": pa.array(
             [pd.Timestamp("1998-05-01")] * 2, pa.timestamp("us")),
         "o_totalprice": pa.array([100.0, 50.0], pa.float64())}
    ))
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([7, 8], pa.int64()),
         "c_name": pa.array(["Customer#7", "Customer#8"], pa.string())}
    ))
    out = _to_df(q_big_orders(str(d)))
    assert len(out) == 0
    assert list(out.columns) == [
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "total_qty",
    ]


def test_big_orders_finds_planted_and_attaches_name(ray_session, tmp_path):
    """One order sums past the threshold across MULTIPLE line items (the
    two-phase aggregate must combine partials, not test per-row qty)."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        BIG_ORDER_QTY,
        q_big_orders,
    )

    d = tmp_path / "sf"
    d.mkdir()
    half = BIG_ORDER_QTY // 2 + 1  # two of these clear the threshold
    _write(d, "lineitem", pa.table(
        {"l_orderkey": pa.array([1, 1, 2], pa.int64()),
         "l_quantity": pa.array([float(half), float(half), 5.0],
                                pa.float64())}
    ))
    _write(d, "orders", pa.table(
        {"o_orderkey": pa.array([1, 2], pa.int64()),
         "o_custkey": pa.array([7, 8], pa.int64()),
         "o_orderdate": pa.array(
             [pd.Timestamp("1998-05-01"), pd.Timestamp("1999-01-02")],
             pa.timestamp("us")),
         "o_totalprice": pa.array([123.45, 50.0], pa.float64())}
    ))
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([7, 8], pa.int64()),
         "c_name": pa.array(["Customer#7", "Customer#8"], pa.string())}
    ))
    out = _to_df(q_big_orders(str(d)))
    assert out.to_dict("records") == [
        {"c_name": "Customer#7", "c_custkey": 7, "o_orderkey": 1,
         "o_orderdate": "1998-05-01", "o_totalprice": 123.45,
         "total_qty": 2 * half}
    ]


def test_idle_rich_empty_when_no_positive_balance(ray_session, tmp_path):
    """n=0 / s=0 scalar edge: with no positive balance the threshold
    comparison (bal_c * 0 > 0) is false for everyone — empty, no division."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_idle_rich_customers,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([1, 2], pa.int64()),
         "c_nationkey": pa.array([0, 1], pa.int64()),
         "c_acctbal": pa.array([-5.0, 0.0], pa.float64())}
    ))
    _write(d, "orders", pa.table(
        {"o_custkey": pa.array([], pa.int64()),
         "o_orderdate": pa.array([], pa.timestamp("us"))}
    ))
    out = _to_df(q_idle_rich_customers(str(d)))
    assert len(out) == 0
    assert list(out.columns) == ["c_nationkey", "n_customers",
                                 "total_acctbal"]


def test_idle_rich_threshold_and_recency_both_bind(ray_session, tmp_path):
    """Four customers: only the one ABOVE the positive-balance average with
    no post-cutoff order survives. Positive average = (100+300+200)/3 = 200,
    strictly-above keeps bal=300 only if idle, bal=200 is not above."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_idle_rich_customers,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
         "c_nationkey": pa.array([0, 0, 1, 1], pa.int64()),
         "c_acctbal": pa.array([100.0, 300.0, 200.0, -50.0], pa.float64())}
    ))
    # customer 2 is rich AND idle (old order only); 3 is at the average
    # (not above); 1 below; 4 negative. A recent order would disqualify 2.
    _write(d, "orders", pa.table(
        {"o_custkey": pa.array([2, 3], pa.int64()),
         "o_orderdate": pa.array(
             [pd.Timestamp("1999-01-01"), pd.Timestamp("2001-01-01")],
             pa.timestamp("us"))}
    ))
    out = _to_df(q_idle_rich_customers(str(d)))
    assert out.to_dict("records") == [
        {"c_nationkey": 0, "n_customers": 1, "total_acctbal": 300.0}
    ]


def test_part_type_suppliers_distinct_and_missing_part_dropped(
    ray_session, tmp_path
):
    """A supplier shipping the same type via two parts (and the same part
    twice) counts ONCE; a lineitem referencing an unknown partkey is
    dropped, not miscounted."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_part_type_suppliers,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "part", pa.table(
        {"p_partkey": pa.array([10, 11, 12], pa.int64()),
         "p_type": pa.array(["PROMO", "PROMO", "SMALL"], pa.string())}
    ))
    _write(d, "lineitem", pa.table(
        {"l_partkey": pa.array([10, 10, 11, 12, 999], pa.int64()),
         "l_suppkey": pa.array([1, 1, 1, 2, 3], pa.int64())}
    ))
    out = _to_df(q_part_type_suppliers(str(d)))
    assert out.to_dict("records") == [
        {"p_type": "PROMO", "n_suppliers": 1},
        {"p_type": "SMALL", "n_suppliers": 1},
    ]


def test_forecast_revenue_counts_only_the_cents_band(ray_session, tmp_path):
    """Discount band compares on exact cents: 0.05 and 0.07 are in, 0.04 and
    0.08 out; qty/date bounds bind; revenue = price x discount at x10000."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_forecast_revenue,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "lineitem", pa.table(
        {"l_shipdate": pa.array(
            [pd.Timestamp("1998-06-01")] * 4
            + [pd.Timestamp("1997-12-31"), pd.Timestamp("1998-06-01")],
            pa.timestamp("us")),
         "l_quantity": pa.array([10.0, 10.0, 10.0, 10.0, 10.0, 24.0],
                                pa.float64()),
         "l_discount": pa.array([0.04, 0.05, 0.07, 0.08, 0.05, 0.05],
                                pa.float64()),
         "l_extendedprice": pa.array([100.0] * 6, pa.float64())}
    ))
    out = _to_df(q_forecast_revenue(str(d)))
    # rows 2 and 3 qualify: 100*0.05 + 100*0.07 = 12.0
    assert out.to_dict("records") == [{"n_items": 2, "revenue": 12.0}]


def test_returned_losses_ties_rank_by_custkey(ray_session, tmp_path):
    """Equal returned revenue -> rank by ascending custkey; non-R lines and
    out-of-window orders contribute nothing."""
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        q_returned_item_losses,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "lineitem", pa.table(
        {"l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
         "l_extendedprice": pa.array([100.0, 50.0, 100.0, 100.0],
                                     pa.float64()),
         "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
         "l_returnflag": pa.array(["R", "N", "R", "R"], pa.string())}
    ))
    # orders 1 and 2 in window (customers 9 and 5, equal R-revenue 100);
    # order 3 outside the window
    _write(d, "orders", pa.table(
        {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
         "o_custkey": pa.array([9, 5, 9], pa.int64()),
         "o_orderdate": pa.array(
             [pd.Timestamp("1998-02-01"), pd.Timestamp("1998-03-01"),
              pd.Timestamp("1997-01-01")],
             pa.timestamp("us"))}
    ))
    _write(d, "customer", pa.table(
        {"c_custkey": pa.array([5, 9], pa.int64()),
         "c_name": pa.array(["Customer#5", "Customer#9"], pa.string()),
         "c_nationkey": pa.array([0, 1], pa.int64())}
    ))
    _write(d, "nation", pa.table(
        {"n_nationkey": pa.array([0, 1], pa.int64()),
         "n_name": pa.array(["ALGERIA", "ARGENTINA"], pa.string())}
    ))
    out = _to_df(q_returned_item_losses(str(d)))
    assert out.to_dict("records") == [
        {"rank": 1, "c_custkey": 5, "c_name": "Customer#5",
         "n_name": "ALGERIA", "revenue": 100.0},
        {"rank": 2, "c_custkey": 9, "c_name": "Customer#9",
         "n_name": "ARGENTINA", "revenue": 100.0},
    ]


def test_percent_rank_ties_share_and_bounds(ray_session, tmp_path):
    """Broadcast-CDF percent_rank: ties share the strictly-smaller count,
    the global min ranks 0, the unique max ranks 1; NULL values drop."""
    from otelcol_con_spaneventtolog_ray.functions.quantiles import (
        q_value_percent_rank,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "events", pa.table(
        {"event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
         "value": pa.array([1.0, 2.0, 2.0, 3.0, None], pa.float64())}
    ))
    out = _to_df(q_value_percent_rank(str(d))).sort_values(
        "event_id").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"event_id": 1, "vm": 1000, "pct_rank": 0.0},
        {"event_id": 2, "vm": 2000, "pct_rank": round(1 / 3, 6)},
        {"event_id": 3, "vm": 2000, "pct_rank": round(1 / 3, 6)},
        {"event_id": 4, "vm": 3000, "pct_rank": 1.0},
    ]


def test_mad_planted_exact(ray_session, tmp_path):
    """Hand-checkable MAD: values [1,2,3,4,100] -> median 3 (rank (5-1)*50//100
    = 2), |v-3| = [2,1,0,1,97] -> MAD 1. The outlier (100) moves the mean
    wildly but must not move the MAD — the robustness property."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    tbl = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array([pd.Timestamp(i, unit="s") for i in range(5)],
                           pa.timestamp("us")),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["m"] * 5, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 5, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    import __ray_entry__ as e

    from tests.test_entry_queries import _to_df

    got = _to_df(e.queries()["events_value_mad"](str(tmp_path)))
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n"] == 5 and row["median"] == 3.0 and row["mad"] == 1.0


def test_session_duration_quantiles_planted(ray_session, tmp_path):
    """Two users, three sessions with durations 0s, 10s, 100s (gaps beyond
    SESSION_GAP_US split sessions): median = 10s, p99 = 100s, n = 3."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from otelcol_con_spaneventtolog_ray.functions.eventops import (
        SESSION_GAP_US,
    )

    gap = (SESSION_GAP_US + 1_000_000) // 1_000_000  # seconds past the gap
    rows = [
        # u1 session A: 2 events 10 s apart
        (1, 0, 1), (2, 10, 1),
        # u1 session B after the gap: single event -> duration 0
        (3, 10 + gap, 1),
        # u2 one session: 2 events 100 s apart
        (4, 0, 2), (5, 100, 2),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([pd.Timestamp(r[1], unit="s") for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    import __ray_entry__ as e

    from tests.test_entry_queries import _to_df

    got = _to_df(e.queries()["events_session_duration_quantiles"](
        str(tmp_path)
    ))
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n"] == 3
    # lower-order-statistic rank contract: ((n-1)*p)//100 -> indices
    # p25->0, p50->1, p99->1 for n=3 (p99 only reaches the max for n>=100)
    assert row["p25"] == 0.0 and row["p50"] == 10.0 and row["p99"] == 10.0
