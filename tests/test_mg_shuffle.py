"""Misra-Gries heavy hitters (sketch guarantees on planted data) and the
deterministic epoch shuffle (exact permutation + SQL parity is covered by
the SQL_CHECKED parametrization; here: permutation property + stability)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from otelcol_con_spaneventtolog_ray.functions.sketch import (
    MG_K,
    mg_reduce,
    q_mg_heavy_users,
)
from tests.test_entry_queries import _to_df


def _write_events(tmp_path, user_ids):
    n = len(user_ids)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_000_000 * i for i in range(n)],
                           pa.timestamp("us")),
            "user_id": pa.array(list(user_ids), pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_mg_planted_heavy_users_survive(ray_session, tmp_path):
    """Every user above n/(K+1) must survive with est <= true <= est+bound."""
    rng = np.random.default_rng(11)
    noise = rng.integers(1000, 11000, size=20_000)  # ~2 events/user
    heavies = np.repeat([7, 8, 9], 3000)            # 3000 each
    uids = np.concatenate([noise, heavies])
    rng.shuffle(uids)
    sf = _write_events(tmp_path, uids)
    got = _to_df(q_mg_heavy_users(sf)).set_index("user_id")
    n_total = len(uids)
    bound = n_total // (MG_K + 1)
    true = {u: int((uids == u).sum()) for u in (7, 8, 9)}
    for u in (7, 8, 9):
        assert u in got.index, f"heavy user {u} lost (bound={bound})"
        est = int(got.loc[u, "est_count"])
        assert est <= true[u]
        assert true[u] - est <= bound
        assert int(got.loc[u, "err_bound"]) == bound


def test_mg_reduce_keeps_at_most_k_and_never_inflates():
    keys = np.arange(200, dtype=np.int64)
    counts = np.arange(1, 201, dtype=np.int64)
    ku, kc = mg_reduce(keys, counts, 10)
    assert len(ku) <= 10
    lookup = dict(zip(keys.tolist(), counts.tolist()))
    assert all(kc[i] <= lookup[int(ku[i])] for i in range(len(ku)))
    # small inputs pass through exactly
    ku2, kc2 = mg_reduce(keys[:5], counts[:5], 10)
    assert ku2.tolist() == keys[:5].tolist()
    assert kc2.tolist() == counts[:5].tolist()


def test_epoch_shuffle_is_exact_permutation(ray_session, tmp_path):
    from otelcol_con_spaneventtolog_ray.functions.corpus import (
        q_epoch_shuffle,
    )

    ids = list(range(0, 999, 3))  # sparse, non-contiguous doc ids
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x"] * len(ids), pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["web"] * len(ids), pa.string()),
            "n_chars": pa.array([1] * len(ids), pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    a = _to_df(q_epoch_shuffle(str(tmp_path)))
    # exact permutation: every position 0..n-1 exactly once, all docs present
    assert sorted(a["epoch_pos"].tolist()) == list(range(len(ids)))
    assert sorted(a["doc_id"].tolist()) == ids
    # deterministic: a second run is byte-identical
    b = _to_df(q_epoch_shuffle(str(tmp_path)))
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True)
    )
    # and genuinely shuffled: not the identity order
    by_doc = a.sort_values("doc_id")["epoch_pos"].tolist()
    assert by_doc != sorted(by_doc)


def test_watermark_lateness_semantics(ray_session, tmp_path):
    """Arrival order (event_id) drives the watermark: an event exactly AT
    watermark - lateness is on-time (strict <), one microsecond further is
    dropped; the first arrival is never late; the late count rides the
    window_start_us = -1 sentinel row."""
    from otelcol_con_spaneventtolog_ray.functions.eventops import (
        WM_LATENESS,
        WM_WINDOW,
        q_watermark_counts,
    )

    W, L = WM_WINDOW, WM_LATENESS
    # (event_id = arrival order, ts_us)
    arrivals = [
        (0, 5 * W),          # first arrival: never late; wm -> 5W
        (1, 5 * W - L),      # exactly wm - L: ON TIME (strict <)
        (2, 5 * W - L - 1),  # one us beyond: LATE
        (3, 9 * W),          # advances wm to 9W
        (4, 9 * W - L - 1),  # late vs new wm
        (5, 9 * W - L),      # boundary again: on time
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    eid, ts = zip(*arrivals)
    tbl = pa.table(
        {
            "event_id": pa.array(list(eid), pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "user_id": pa.array([1] * len(eid), pa.int64()),
            "event_type": pa.array(["click"] * len(eid), pa.string()),
            "value": pa.array([1.0] * len(eid), pa.float64()),
            "props": pa.array(["{}"] * len(eid), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    got = _to_df(q_watermark_counts(str(tmp_path))).set_index(
        "window_start_us"
    )
    # L == 2W here, so on-time windows: 5W (ev 0), 3W (ev 1), 9W (ev 3),
    # 7W (ev 5); events 2 and 4 are one us past the boundary -> dropped
    assert got.loc[-1, "n_events"] == 2
    for w in (3 * W, 5 * W, 7 * W, 9 * W):
        assert got.loc[w, "n_events"] == 1
    assert int(got["n_events"].sum()) == 6
