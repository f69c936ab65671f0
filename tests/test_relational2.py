"""Second relational tranche (Q4/Q7/Q8/Q12/Q17/Q19/Q21 shapes): full-table
parity against the DuckDB mirrors at sf0.001, plus planted fixtures for the
semantics the synthetic data exercises only in aggregate (the Q21
sole-supplier sum-trick, the Q17 strict integer threshold, Q19 bracket
bounds, Q7 direction filter)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_entry_queries import _canon, _to_df

SF_DIR = "/root/testdata/sf0.001"
NEW_QUERIES = [
    "rel_priority_backlog",
    "rel_shipstatus_priority",
    "rel_nation_volume",
    "rel_market_share",
    "rel_small_qty_revenue",
    "rel_bracket_revenue",
    "rel_late_sole_supplier",
]

_BASE = np.datetime64("1995-01-01", "us").astype("int64")
_DAY = 86_400_000_000


def _ts(days):
    return np.array(
        [_BASE + d * _DAY for d in days], dtype=np.int64
    ).astype("datetime64[us]")


def _parity(sf, name):
    import __ray_entry__ as e

    got = _canon(_to_df(e.queries()[name](sf)))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    exp = _canon(con.execute(e.oracle_sql()[name]).df())
    assert len(got) == len(exp), f"{name}: {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    return got


# full-table sf0.001 parity for all seven runs via tests/test_functions.py's
# SQL_CHECKED parametrization; this file holds the planted-semantics fixtures

# ---------------------------------------------------------------------------
# planted fixtures
# ---------------------------------------------------------------------------

def _write_tpch(tmp_path, *, orders=(), lineitem=(), supplier=(),
                customer=(), part=()):
    """Minimal TPC-H-shaped tables.

    orders:   (okey, custkey, status, odate_day, priority)
    lineitem: (okey, partkey, suppkey, qty, price, disc, status, shipdate_day)
    supplier: (suppkey, nationkey)
    customer: (custkey, nationkey)
    part:     (partkey, brand, type, size)
    """
    ok, ck, st, od, op = zip(*orders) if orders else ((),) * 5
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(list(ok), pa.int64()),
                "o_custkey": pa.array(list(ck), pa.int64()),
                "o_orderstatus": pa.array(list(st), pa.string()),
                "o_totalprice": pa.array([0.0] * len(ok), pa.float64()),
                "o_orderdate": pa.array(_ts(od)),
                "o_orderpriority": pa.array(list(op), pa.string()),
            }
        ),
        os.path.join(tmp_path, "orders.parquet"),
    )
    lk, lp, lsup, lq, lpr, ld, lst, lsd = (
        zip(*lineitem) if lineitem else ((),) * 8
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(list(lk), pa.int64()),
                "l_partkey": pa.array(list(lp), pa.int64()),
                "l_suppkey": pa.array(list(lsup), pa.int64()),
                "l_linenumber": pa.array([1] * len(lk), pa.int32()),
                "l_quantity": pa.array([float(q) for q in lq], pa.float64()),
                "l_extendedprice": pa.array(
                    [float(p) for p in lpr], pa.float64()
                ),
                "l_discount": pa.array([float(d) for d in ld], pa.float64()),
                "l_tax": pa.array([0.0] * len(lk), pa.float64()),
                "l_returnflag": pa.array(["N"] * len(lk), pa.string()),
                "l_linestatus": pa.array(list(lst), pa.string()),
                "l_shipdate": pa.array(_ts(lsd)),
            }
        ),
        os.path.join(tmp_path, "lineitem.parquet"),
    )
    sk, sn = zip(*supplier) if supplier else ((), ())
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(list(sk), pa.int64()),
                "s_name": pa.array([f"Supplier#{k:09d}" for k in sk],
                                   pa.string()),
                "s_nationkey": pa.array(list(sn), pa.int32()),
                "s_acctbal": pa.array([0.0] * len(sk), pa.float64()),
            }
        ),
        os.path.join(tmp_path, "supplier.parquet"),
    )
    ck2, cn2 = zip(*customer) if customer else ((), ())
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(list(ck2), pa.int64()),
                "c_name": pa.array([f"Customer#{k:09d}" for k in ck2],
                                   pa.string()),
                "c_nationkey": pa.array(list(cn2), pa.int32()),
                "c_acctbal": pa.array([0.0] * len(ck2), pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"] * len(ck2), pa.string()),
            }
        ),
        os.path.join(tmp_path, "customer.parquet"),
    )
    pk, pb, pt, psz = zip(*part) if part else ((),) * 4
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(list(pk), pa.int64()),
                "p_name": pa.array(["p"] * len(pk), pa.string()),
                "p_brand": pa.array(list(pb), pa.string()),
                "p_type": pa.array(list(pt), pa.string()),
                "p_size": pa.array(list(psz), pa.int32()),
                "p_retailprice": pa.array([1.0] * len(pk), pa.float64()),
            }
        ),
        os.path.join(tmp_path, "part.parquet"),
    )
    nk = list(range(25))
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(nk, pa.int32()),
                "n_name": pa.array([f"NATION_{k}" for k in nk], pa.string()),
                "n_regionkey": pa.array([k % 5 for k in nk], pa.int32()),
            }
        ),
        os.path.join(tmp_path, "nation.parquet"),
    )
    return str(tmp_path)


def test_q21_sole_late_supplier_semantics(ray_session, tmp_path):
    """Blame lands only on the SOLE late supplier of a finished
    multi-supplier order; single-supplier, multi-late, and open orders are
    all excluded. 91 days late is late; exactly 90 is not."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational2 import (
        Q21_LATE_DAYS,
    )

    L = Q21_LATE_DAYS
    orders = [
        (1, 1, "F", 0, "5-LOW"),    # two supps, only supp 7 late -> blame 7
        (2, 1, "F", 0, "5-LOW"),    # two supps, BOTH late -> no blame
        (3, 1, "F", 0, "5-LOW"),    # single supp late -> no blame (nsupp=1)
        (4, 1, "O", 0, "5-LOW"),    # open order -> excluded
        (5, 1, "F", 0, "5-LOW"),    # two supps, supp 7 exactly 90d -> none
        (6, 1, "F", 0, "5-LOW"),    # supp 7 late again -> blame 7 (n=2)
    ]
    lineitem = [
        # okey, partkey, suppkey, qty, price, disc, status, shipday
        (1, 1, 7, 1, 10.0, 0.0, "F", L + 1),
        (1, 1, 8, 1, 10.0, 0.0, "F", 1),
        (1, 1, 7, 1, 10.0, 0.0, "F", 2),   # second line same supp: one pair
        (2, 1, 7, 1, 10.0, 0.0, "F", L + 1),
        (2, 1, 8, 1, 10.0, 0.0, "F", L + 2),
        (3, 1, 7, 1, 10.0, 0.0, "F", L + 1),
        (4, 1, 7, 1, 10.0, 0.0, "F", L + 1),
        (4, 1, 8, 1, 10.0, 0.0, "F", 1),
        (5, 1, 7, 1, 10.0, 0.0, "F", L),   # exactly +90d: NOT late
        (5, 1, 8, 1, 10.0, 0.0, "F", 1),
        (6, 1, 7, 1, 10.0, 0.0, "F", L + 5),
        (6, 1, 9, 1, 10.0, 0.0, "F", 1),
    ]
    sf = _write_tpch(
        tmp_path, orders=orders, lineitem=lineitem,
        supplier=[(7, 0), (8, 0), (9, 0)], customer=[(1, 0)],
        part=[(1, "Brand#1", "PROMO", 1)],
    )
    got = _parity(sf, "rel_late_sole_supplier")
    got = _to_df(e.queries()["rel_late_sole_supplier"](sf))
    assert got["s_suppkey"].tolist() == [7]
    assert got["numwait"].tolist() == [2]
    assert got["rank"].tolist() == [1]


def test_q17_strict_integer_threshold(ray_session, tmp_path):
    """qty < 0.2 * avg as exact integers: a line AT the threshold is
    excluded, one below is included; parts outside the brand/size slice
    never contribute."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational2 import (
        Q17_BRAND, Q17_MAX_SIZE,
    )

    # part 1 in slice: five lines qty 10 -> avg 10, threshold qty < 2
    lineitem = [
        (1, 1, 7, 10, 100.0, 0.0, "F", 1),
        (2, 1, 7, 10, 100.0, 0.0, "F", 1),
        (3, 1, 7, 10, 100.0, 0.0, "F", 1),
        (4, 1, 7, 8, 100.0, 0.0, "F", 1),
        (5, 1, 7, 10, 100.0, 0.0, "F", 1),
        (6, 1, 7, 2, 77.0, 0.0, "F", 1),    # 5*2*6 = 60 >= 58 sum? see below
        (7, 1, 7, 1, 700.0, 0.0, "F", 1),   # below threshold -> included
        (8, 2, 7, 1, 999.0, 0.0, "F", 1),   # part 2 outside slice
    ]
    # sum_qty = 10*4 + 8 + 2 + 1 = 51, cnt = 7 -> include iff 5*q*7 < 51
    # q=1 -> 35 < 51 include; q=2 -> 70 >= 51 exclude
    sf = _write_tpch(
        tmp_path, orders=[(1, 1, "F", 0, "5-LOW")], lineitem=lineitem,
        supplier=[(7, 0)], customer=[(1, 0)],
        part=[(1, Q17_BRAND, "PROMO", Q17_MAX_SIZE),
              (2, "Brand#99", "PROMO", 1)],
    )
    got = _parity(sf, "rel_small_qty_revenue")
    got = _to_df(e.queries()["rel_small_qty_revenue"](sf))
    assert got["avg_yearly"].tolist() == [round(700.0 / 7.0, 6)]


def test_q19_bracket_bounds(ray_session, tmp_path):
    """Quantity bounds are inclusive on both ends; brand and size must
    match the same bracket as the quantity (no cross-bracket mixing)."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational2 import (
        Q19_BRACKETS,
    )

    b0, mx0, lo0, hi0 = Q19_BRACKETS[0]
    b1, mx1, lo1, hi1 = Q19_BRACKETS[1]
    lineitem = [
        (1, 1, 7, lo0, 100.0, 0.0, "F", 1),      # at lower bound -> in
        (2, 1, 7, hi0, 50.0, 0.0, "F", 1),       # at upper bound -> in
        (3, 1, 7, hi0 + 1, 999.0, 0.0, "F", 1),  # above -> out
        (4, 2, 7, lo0, 999.0, 0.0, "F", 1),      # brand1 sized for bracket0
        # qty in bracket0 but part is bracket1's brand w/ size > mx0? size 7
        # is <= mx1 but qty lo0 may be outside [lo1, hi1] -> out unless
        # bracket1 matches; lo0=1 < lo1=10 -> out
        (5, 3, 7, lo1, 40.0, 0.1, "F", 1),       # bracket1 at lower bound
    ]
    sf = _write_tpch(
        tmp_path, orders=[(1, 1, "F", 0, "5-LOW")], lineitem=lineitem,
        supplier=[(7, 0)], customer=[(1, 0)],
        part=[(1, b0, "PROMO", mx0),        # bracket 0 part at max size
              (2, b1, "PROMO", mx0),        # bracket 1 brand, small size
              (3, b1, "PROMO", mx1)],
    )
    got = _parity(sf, "rel_bracket_revenue")
    got = _to_df(e.queries()["rel_bracket_revenue"](sf))
    assert got["revenue"].tolist() == [round(150.0 + 40.0 * 0.9, 6)]


def test_q7_direction_filter(ray_session, tmp_path):
    """Only A->B and B->A flows count: same-nation and third-nation flows
    are excluded even when supplier or customer is in the pair."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational2 import (
        Q7_NATION_A, Q7_NATION_B, Q7_SHIP_FROM,
    )

    a, b = Q7_NATION_A, Q7_NATION_B
    d0 = int(
        (np.datetime64(Q7_SHIP_FROM) - np.datetime64("1995-01-01"))
        .astype("timedelta64[D]").astype(int)
    ) + 1
    orders = [
        (1, 1, "F", 0, "5-LOW"),   # cust in B
        (2, 2, "F", 0, "5-LOW"),   # cust in A
        (3, 3, "F", 0, "5-LOW"),   # cust in third nation
        (4, 1, "F", 0, "5-LOW"),   # cust in B
    ]
    lineitem = [
        (1, 1, 7, 1, 100.0, 0.0, "F", d0),   # supp A -> cust B: in
        (2, 1, 8, 1, 200.0, 0.0, "F", d0),   # supp B -> cust A: in
        (2, 1, 7, 1, 400.0, 0.0, "F", d0),   # supp A -> cust A: out
        (3, 1, 7, 1, 800.0, 0.0, "F", d0),   # supp A -> third: out
        (4, 1, 9, 1, 1600.0, 0.0, "F", d0),  # third -> cust B: out
        (1, 1, 7, 1, 3200.0, 0.0, "F", 1),   # before window: out
    ]
    sf = _write_tpch(
        tmp_path, orders=orders, lineitem=lineitem,
        supplier=[(7, a), (8, b), (9, 13)],
        customer=[(1, b), (2, a), (3, 13)],
        part=[(1, "Brand#1", "PROMO", 1)],
    )
    got = _parity(sf, "rel_nation_volume")
    got = _to_df(e.queries()["rel_nation_volume"](sf))
    got = got.set_index(["supp_nation", "cust_nation"])
    assert got.loc[(f"NATION_{a}", f"NATION_{b}"), "revenue"] == 100.0
    assert got.loc[(f"NATION_{b}", f"NATION_{a}"), "revenue"] == 200.0
    assert len(got) == 2


def test_q4_exists_and_window(ray_session, tmp_path):
    """An order counts once no matter how many late lines it has; orders
    outside the quarter or with no late line never count."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational2 import (
        Q4_LATE_SHIP, Q4_ORDER_FROM,
    )

    q = int(
        (np.datetime64(Q4_ORDER_FROM) - np.datetime64("1995-01-01"))
        .astype("timedelta64[D]").astype(int)
    )
    late = int(
        (np.datetime64(Q4_LATE_SHIP) - np.datetime64("1995-01-01"))
        .astype("timedelta64[D]").astype(int)
    )
    orders = [
        (1, 1, "F", q + 1, "1-URGENT"),   # in quarter, 2 late lines -> 1
        (2, 1, "F", q + 2, "1-URGENT"),   # in quarter, no late line -> 0
        (3, 1, "F", q - 10, "2-HIGH"),    # before quarter -> 0
        (4, 1, "F", q + 3, "5-LOW"),      # in quarter, 1 late line -> 1
    ]
    lineitem = [
        (1, 1, 7, 1, 1.0, 0.0, "F", late + 1),
        (1, 1, 7, 1, 1.0, 0.0, "F", late + 2),
        (2, 1, 7, 1, 1.0, 0.0, "F", late - 1),
        (3, 1, 7, 1, 1.0, 0.0, "F", late + 1),
        (4, 1, 7, 1, 1.0, 0.0, "F", late + 1),
    ]
    sf = _write_tpch(
        tmp_path, orders=orders, lineitem=lineitem,
        supplier=[(7, 0)], customer=[(1, 0)],
        part=[(1, "Brand#1", "PROMO", 1)],
    )
    got = _parity(sf, "rel_priority_backlog")
    got = _to_df(e.queries()["rel_priority_backlog"](sf))
    got = got.set_index("o_orderpriority")
    assert got.loc["1-URGENT", "n_orders"] == 1
    assert got.loc["5-LOW", "n_orders"] == 1
    assert len(got) == 2


def test_q8_share_and_region_filter(ray_session, tmp_path):
    """Share = target-nation revenue / all-nation revenue per year, only
    over PROMO parts ordered by region-ASIA customers inside the window."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational2 import (
        Q8_ORDER_FROM, Q8_REGION_KEY, Q8_TARGET_NATION,
    )

    d0 = int(
        (np.datetime64(Q8_ORDER_FROM) - np.datetime64("1995-01-01"))
        .astype("timedelta64[D]").astype(int)
    ) + 1
    asia_nk = Q8_REGION_KEY  # nationkey % 5 == Q8_REGION_KEY
    orders = [
        (1, 1, "F", d0, "5-LOW"),       # ASIA customer, in window
        (2, 2, "F", d0, "5-LOW"),       # non-ASIA customer -> excluded
        (3, 1, "F", d0 - 400, "5-LOW"),  # before window -> excluded
    ]
    lineitem = [
        (1, 1, 7, 1, 300.0, 0.0, "F", 1),   # target supp, PROMO -> num+den
        (1, 1, 8, 1, 100.0, 0.0, "F", 1),   # other supp, PROMO -> den only
        (1, 2, 7, 1, 999.0, 0.0, "F", 1),   # non-PROMO part -> excluded
        (2, 1, 7, 1, 999.0, 0.0, "F", 1),   # non-ASIA order -> excluded
        (3, 1, 7, 1, 999.0, 0.0, "F", 1),   # out-of-window order -> excluded
    ]
    sf = _write_tpch(
        tmp_path, orders=orders, lineitem=lineitem,
        supplier=[(7, Q8_TARGET_NATION), (8, 0)],
        customer=[(1, asia_nk), (2, 1)],
        part=[(1, "Brand#1", "PROMO", 1), (2, "Brand#1", "LARGE", 1)],
    )
    got = _parity(sf, "rel_market_share")
    got = _to_df(e.queries()["rel_market_share"](sf))
    assert got["mkt_share"].tolist() == [0.75]


def test_q12_line_counting(ray_session, tmp_path):
    """Every in-window LINE counts toward its order's priority class (not
    one per order); out-of-window lines are excluded."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational2 import (
        Q12_SHIP_FROM,
    )

    d0 = int(
        (np.datetime64(Q12_SHIP_FROM) - np.datetime64("1995-01-01"))
        .astype("timedelta64[D]").astype(int)
    ) + 1
    orders = [
        (1, 1, "F", 0, "1-URGENT"),
        (2, 1, "F", 0, "4-NOT SPECIFIED"),
    ]
    lineitem = [
        (1, 1, 7, 1, 1.0, 0.0, "F", d0),      # high, F
        (1, 1, 7, 1, 1.0, 0.0, "F", d0 + 1),  # high, F (same order: counts)
        (1, 1, 7, 1, 1.0, 0.0, "O", d0),      # high, O
        (2, 1, 7, 1, 1.0, 0.0, "F", d0),      # low, F
        (2, 1, 7, 1, 1.0, 0.0, "F", 1),       # out of window
    ]
    sf = _write_tpch(
        tmp_path, orders=orders, lineitem=lineitem,
        supplier=[(7, 0)], customer=[(1, 0)],
        part=[(1, "Brand#1", "PROMO", 1)],
    )
    got = _parity(sf, "rel_shipstatus_priority")
    got = _to_df(e.queries()["rel_shipstatus_priority"](sf))
    got = got.set_index("l_linestatus")
    assert got.loc["F", "high_line_count"] == 2
    assert got.loc["F", "low_line_count"] == 1
    assert got.loc["O", "high_line_count"] == 1
    assert got.loc["O", "low_line_count"] == 0


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_relational2_empty_inputs(ray_session, tmp_path, name):
    import __ray_entry__ as e

    sf = _write_tpch(tmp_path)
    out = _to_df(e.queries()[name](sf))
    if name in ("rel_small_qty_revenue", "rel_bracket_revenue"):
        # global aggregates return one zero row
        assert len(out) == 1
        assert out.iloc[0, 0] == 0.0
    else:
        assert len(out) == 0


def test_q2_argmin_tiebreak_and_carry(ray_session, tmp_path):
    """Equal minimal price -> LOWEST suppkey wins; the carried attributes
    (name, nation) belong to the winning supplier, and the DuckDB mirror
    agrees on the fixture."""
    import duckdb
    import __ray_entry__ as e

    lineitem = [
        # part 1: tie at 10.00 between supp 5 and supp 3 -> supp 3
        (1, 1, 5, 1, 10.00, 0.0, "O", 100),
        (1, 1, 3, 1, 10.00, 0.0, "O", 100),
        (2, 1, 4, 1, 10.01, 0.0, "O", 100),
        # part 2: strict min at supp 5
        (3, 2, 5, 1, 7.50, 0.0, "O", 100),
        (3, 2, 3, 1, 8.00, 0.0, "O", 100),
    ]
    sf = _write_tpch(
        tmp_path, orders=[(1, 1, "F", 0, "5-LOW")], lineitem=lineitem,
        supplier=[(3, 7), (4, 2), (5, 9)], customer=[(1, 0)],
        part=[(1, "b", "t", 1), (2, "b", "t", 1)],
    )
    got = _to_df(e.queries()["rel_cheapest_supplier"](sf))
    assert got["l_partkey"].tolist() == [1, 2]
    assert got["l_suppkey"].tolist() == [3, 5]
    assert got["s_name"].tolist() == ["Supplier#000000003",
                                      "Supplier#000000005"]
    assert got["n_name"].tolist() == ["NATION_7", "NATION_9"]
    assert got["min_price"].tolist() == [10.0, 7.5]
    con = duckdb.connect()
    for t in ("lineitem", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(sf, t)}.parquet')")
    exp = _canon(con.execute(e.oracle_sql()["rel_cheapest_supplier"]).df())
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False,
                                  check_exact=True)


def test_q2_argmin_encoding_bound_fails_fast(ray_session, tmp_path):
    """price_c >= 2^31 must refuse loudly, not wrap into a wrong argmin."""
    import pytest as _pytest
    import __ray_entry__ as e

    sf = _write_tpch(
        tmp_path, orders=[(1, 1, "F", 0, "5-LOW")],
        lineitem=[(1, 1, 3, 1, (1 << 31) / 100.0 + 1.0, 0.0, "O", 100)],
        supplier=[(3, 7)], customer=[(1, 0)], part=[(1, "b", "t", 1)],
    )
    with _pytest.raises(Exception, match="argmin encoding bound"):
        e.queries()["rel_cheapest_supplier"](sf)


def test_ship_latency_quantiles_planted(ray_session, tmp_path):
    """One URGENT order with lineitem latencies [1, 1, 5] days (two
    same-day ships collapse in the combiner but each still counts), one
    LOW order with latency [10]: n and the lower-order-statistic
    percentiles must match the SQL mirror and hand values."""
    import pyarrow as pa

    base = np.datetime64("1995-01-01", "us")
    day = np.timedelta64(86_400_000_000, "us")
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 1], pa.int64()),
            "o_orderstatus": pa.array(["O", "O"], pa.string()),
            "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
            "o_orderdate": pa.array([base, base], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"], pa.string()),
        }
    )
    li_rows = [(1, 1), (1, 1), (1, 5), (2, 10)]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
            "l_partkey": pa.array([1] * 4, pa.int64()),
            "l_suppkey": pa.array([1] * 4, pa.int64()),
            "l_linenumber": pa.array([1, 2, 3, 1], pa.int32()),
            "l_quantity": pa.array([1.0] * 4, pa.float64()),
            "l_extendedprice": pa.array([1.0] * 4, pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_tax": pa.array([0.0] * 4, pa.float64()),
            "l_returnflag": pa.array(["N"] * 4, pa.string()),
            "l_linestatus": pa.array(["O"] * 4, pa.string()),
            "l_shipdate": pa.array(
                [base + r[1] * day for r in li_rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(tmp_path, "lineitem.parquet"))
    got = _parity(str(tmp_path), "rel_ship_latency_quantiles")
    got = got.set_index("pri")
    urgent = got.loc["1-URGENT"]
    assert urgent["n"] == 3
    assert urgent["p25"] == 1 and urgent["p50"] == 1 and urgent["p99"] == 1
    assert urgent["p75"] == 1  # index (2*75)//100 = 1 -> still 1
    low = got.loc["5-LOW"]
    assert low["n"] == 1 and low["p50"] == 10
