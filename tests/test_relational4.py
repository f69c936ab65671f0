"""Fourth relational tranche (Q11 global-fraction HAVING / Q20 nested
semi-join): planted fixtures for the boundary semantics the synthetic data
only exercises in aggregate — the STRICT > at exactly the global threshold,
the ship-window edges, and the part-name semi-join filter. Full-table
sf0.001 parity runs via tests/test_functions.py's SQL_CHECKED list."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from otelcol_con_spaneventtolog_ray.functions.relational4 import (
    Q20_MIN_QTY,
    q_heavy_shippers,
    q_important_parts,
)


def _write(d, name, table):
    pq.write_table(table, str(d / f"{name}.parquet"))


def _lineitem(rows):
    """rows: (orderkey, partkey, suppkey, qty, price, disc, shipdate)."""
    ok, pk, sk, qty, price, disc, ship = zip(*rows)
    return pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array(range(1, len(rows) + 1), pa.int32()),
        "l_quantity": pa.array([float(q) for q in qty], pa.float64()),
        "l_extendedprice": pa.array([float(p) for p in price], pa.float64()),
        "l_discount": pa.array([float(x) for x in disc], pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array(
            np.array(ship, dtype="datetime64[us]"), pa.timestamp("us")
        ),
    })


def _dims(d, part_names):
    _write(d, "part", pa.table({
        "p_partkey": pa.array(range(1, len(part_names) + 1), pa.int64()),
        "p_name": pa.array(part_names, pa.string()),
        "p_brand": pa.array(["B"] * len(part_names), pa.string()),
        "p_type": pa.array(["T"] * len(part_names), pa.string()),
        "p_size": pa.array([1] * len(part_names), pa.int32()),
        "p_retailprice": pa.array([1.0] * len(part_names), pa.float64()),
    }))
    _write(d, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["SUPP_1", "SUPP_2", "SUPP_3"], pa.string()),
        "s_nationkey": pa.array([0, 1, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
    }))
    _write(d, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_0", "NATION_1"], pa.string()),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }))


def test_q11_strict_global_threshold(ray_session, tmp_path):
    """Two parts with revenue 12 and 18: total 30, mean 15, threshold
    1.2x mean = 18 exactly — the boundary part must be EXCLUDED (strict >),
    so the result is empty; nudge the big part up a cent and it qualifies."""
    d = tmp_path / "boundary"
    d.mkdir()
    _dims(d, ["pa", "pb"])
    _write(d, "lineitem", _lineitem([
        (1, 1, 1, 1, 12.00, 0.0, "1997-06-01"),
        (2, 2, 1, 1, 18.00, 0.0, "1997-06-01"),
    ]))
    out = q_important_parts(str(d)).to_pylist()
    assert out == []

    d2 = tmp_path / "over"
    d2.mkdir()
    _dims(d2, ["pa", "pb"])
    _write(d2, "lineitem", _lineitem([
        (1, 1, 1, 1, 12.00, 0.0, "1997-06-01"),
        (2, 2, 1, 1, 18.01, 0.0, "1997-06-01"),
    ]))
    out = q_important_parts(str(d2)).to_pylist()
    assert out == [{"p_partkey": 2, "value": 18.01}]


def test_q11_sums_across_rows_with_discount(ray_session, tmp_path):
    """Per-part revenue folds extprice*(1-disc) across rows before the
    global compare: part 1 = 10*0.9 + 11 = 20, part 2 = 5 -> mean 12.5,
    threshold 15 -> only part 1 qualifies."""
    d = tmp_path / "sum"
    d.mkdir()
    _dims(d, ["pa", "pb"])
    _write(d, "lineitem", _lineitem([
        (1, 1, 1, 1, 10.00, 0.10, "1997-06-01"),
        (2, 1, 1, 1, 11.00, 0.00, "1997-06-01"),
        (3, 2, 1, 1, 5.00, 0.00, "1997-06-01"),
    ]))
    out = q_important_parts(str(d)).to_pylist()
    assert out == [{"p_partkey": 1, "value": 20.0}]


def test_q20_threshold_window_and_name_filter(ray_session, tmp_path):
    """Supplier 1: qty exactly Q20_MIN_QTY -> excluded (strict >).
    Supplier 2: Q20_MIN_QTY+1 inside the window on a matched part -> kept,
    resolved to (name, nation). Supplier 3 would qualify except its rows
    are (a) on an unmatched part and (b) outside the ship window."""
    d = tmp_path / "q20"
    d.mkdir()
    _dims(d, ["red alpha", "blue beta"])  # part 1 matches '%red%', part 2 not
    _write(d, "lineitem", _lineitem([
        (1, 1, 1, Q20_MIN_QTY, 1.0, 0.0, "1997-06-01"),
        (2, 1, 2, Q20_MIN_QTY + 1, 1.0, 0.0, "1997-01-01"),  # FROM inclusive
        (3, 2, 3, Q20_MIN_QTY + 50, 1.0, 0.0, "1997-06-01"),  # name miss
        (4, 1, 3, Q20_MIN_QTY + 50, 1.0, 0.0, "1998-01-01"),  # TO exclusive
        (5, 1, 3, Q20_MIN_QTY + 50, 1.0, 0.0, "1996-12-31"),  # before FROM
    ]))
    out = q_heavy_shippers(str(d)).to_pylist()
    assert out == [
        {"s_name": "SUPP_2", "nation": "NATION_1", "qty": Q20_MIN_QTY + 1}
    ]
