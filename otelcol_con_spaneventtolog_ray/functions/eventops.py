"""Event-stream operators Ray Data lacks natively, composed per SURVEY.md §2's
"custom operators" rule: sessionization (windowed aggregate), as-of join,
range join, top-k per group, and a broadcast-join enrichment via a tiny
two-phase aggregate shipped with ``ray.put``. All over the driver's
``events`` table, each with an exact DuckDB oracle.

The per-USER windows (sessionization / as-of / range join) are
``sort("user_id")`` + ONE vectorized ``map_batches(batch_size=None)`` fold
per block — the sort's range partitioning co-locates every row of a user
in one block (the property pinned by test_sort_colocates_equal_keys...),
and the fold lexsorts the block by (user, ts, event_id) and does all
per-user work through segment boundaries (reduceat / searchsorted /
offset-packed windows). NO per-user Python call exists anywhere: a block
of a million users costs one numpy pass, not a million map_groups
invocations. ``topk_group`` keeps groupby().map_groups because its key
(event_type) has tiny cardinality. The per-group pandas functions are
retained as readable REFERENCE implementations, pinned equal to the block
folds by parity tests.

Partitioning assumption (documented per the rule): ``user_id`` co-locates
each user's history; at 100 TB the key must be salted only for aggregates,
never for these order-dependent windows (a hot user's history must stay
together).

Safety of the fold contract (measured + pinned): with
``batch_size=None`` the batch handed to the fold is the WHOLE sort
partition (the reduce task's RefBundle), not an individual block — even
when the partition far exceeds ``target_max_block_size`` (measured: 640 MB
sort, 71 MB single-key runs, 128 MB cap -> zero keys straddled a batch;
64 KiB cap with ~700 KiB runs likewise, pinned by
test_sorted_fold_batch_is_whole_partition_despite_block_cap). This is the
same mechanism ray.data's own ``GroupedData.map_groups`` is built on
(grouped_data.py: ``sort(key)`` then ``batch_size=None``, "guaranteeing
that groups are contained in full"), so these folds are exactly as safe as
Ray's built-in map_groups — any Ray change that broke the folds would
break map_groups itself, and the pinned test would catch it here.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from ..rayenv import remote_kwargs

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
TOPK_PER_TYPE = 3
_US_PER_DAY = 86_400_000_000


def _floor_div_sql(x: str, d: int) -> str:
    """SQL for numpy-style FLOOR division (DuckDB // truncates toward zero,
    so negative dividends — pre-1970 timestamps — would diverge from the
    numpy day/week/window bucketing): subtract the non-negative modulus
    first, then divide the exact multiple."""
    return f"(({x}) - ((({x}) % {d}) + {d}) % {d}) // {d}"


def _events(sf_dir: str, columns: list[str], require_user: bool = False):
    """Column-pruned events scan. ``require_user=True`` drops NULL-user
    rows at the read — the per-user-op contract (an event without an
    identity belongs to no user journey; mirrors add
    ``WHERE user_id IS NOT NULL``). Without the filter, numpy's
    null→NaN→int64 cast manufactured a garbage sentinel user while DuckDB
    grouped NULL as its own user — parity-fuzz finding."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )
    if require_user:
        def drop_null_user(t: pa.Table) -> pa.Table:
            return t.filter(t.column("user_id").is_valid())

        ds = ds.map_batches(
            drop_null_user, batch_format="pyarrow", **remote_kwargs()
        )
    return ds


def _ts_us(s: pd.Series) -> np.ndarray:
    return s.astype("datetime64[us]").astype("int64").to_numpy()


# ---------------------------------------------------------------------------
# sessionization — gap-based windowed aggregate
# ---------------------------------------------------------------------------

def sessionize_group(df: pd.DataFrame) -> pd.DataFrame:
    """One user's events -> one row per session (>30 min gap starts a new
    one). Runs inside map_groups: the group is a single user's full,
    co-located history."""
    df = df.sort_values(["ts", "event_id"], kind="stable")
    ts = _ts_us(df["ts"])
    brk = np.ones(len(df), dtype=np.int64)
    brk[1:] = (np.diff(ts) > SESSION_GAP_US).astype(np.int64)
    sid = np.cumsum(brk)
    out = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "session_id": sid,
                        "ts_us": ts})
    g = out.groupby("session_id", sort=True)
    return pd.DataFrame(
        {
            "user_id": g["user_id"].first(),
            "session_id": g["session_id"].first(),
            "n_events": g.size(),
            "start_us": g["ts_us"].min(),
            "end_us": g["ts_us"].max(),
        }
    ).reset_index(drop=True)


def _block_sorted(t: pa.Table, extra: tuple[str, ...] = ()):
    """Lexsort one block by (user, ts, event_id); returns aligned arrays."""
    user = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = (
        t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, ts, user))
    out = [user[order], ts[order], eid[order]]
    for c in extra:
        col = t.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out.append(col.take(pa.array(order)))
    return out


def sessionize_block(t: pa.Table) -> pa.Table:
    """Segment-vectorized sessionization over one user-complete block."""
    if t.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "session_id": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "start_us": pa.array([], pa.int64()),
             "end_us": pa.array([], pa.int64())}
        )
    user, ts, _eid = _block_sorted(t)
    n = len(user)
    brk = np.ones(n, dtype=bool)
    brk[1:] = (user[1:] != user[:-1]) | (ts[1:] - ts[:-1] > SESSION_GAP_US)
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], n)
    sess_user = user[starts]
    # per-user session numbering: rank of the session within its user's runs
    ufirst = np.flatnonzero(
        np.concatenate([[True], sess_user[1:] != sess_user[:-1]])
    )
    lens = np.diff(np.append(ufirst, len(starts)))
    session_id = np.arange(len(starts)) - np.repeat(ufirst, lens) + 1
    return pa.table(
        {
            "user_id": pa.array(sess_user, pa.int64()),
            "session_id": pa.array(session_id, pa.int64()),
            "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[ends - 1], pa.int64()),
        }
    )


def q_sessionization(sf_dir: str):
    return (
        _events(sf_dir, ["event_id", "ts", "user_id"], require_user=True)
        .sort("user_id")
        .map_batches(sessionize_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )


#: the o/s sessionization CTE prefix — ONE definition of the break/window
#: rule, shared by _SESSION_SQL and quantiles._session_q_sql so the two
#: gated mirrors cannot silently diverge
SESSION_CTES = f"""o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)"""

_SESSION_SQL = f"""
WITH {SESSION_CTES}
SELECT user_id, CAST(sid AS BIGINT) AS session_id, count(*) AS n_events,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# as-of join — latest 'error' at or before each event, per user
# ---------------------------------------------------------------------------

def asof_last_error_group(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-user as-of: searchsorted of event times into the sorted
    error times of the same (co-located) user."""
    df = df.sort_values(["ts", "event_id"], kind="stable")
    ts = _ts_us(df["ts"])
    err_ts = ts[(df["event_type"] == "error").to_numpy()]
    if len(err_ts):
        idx = np.searchsorted(err_ts, ts, side="right") - 1
        last = np.where(idx >= 0, err_ts[np.maximum(idx, 0)], -1)
    else:  # user with no error events at all
        last = np.full(len(ts), -1, dtype=np.int64)
    return pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "ts_us": ts,
            "last_error_us": last,  # -1 = no prior error (SQL mirrors this)
        }
    )


def asof_last_error_block(t: pa.Table) -> pa.Table:
    """Segment-vectorized as-of: in (user, ts, event_id) order, the latest
    error with er.ts <= e.ts is the latest error row at or before the END
    of e's (user, ts) run (equal-ts errors count regardless of event_id),
    clamped to the user's segment start."""
    if t.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "ts_us": pa.array([], pa.int64()),
             "last_error_us": pa.array([], pa.int64())}
        )
    user, ts, eid, etype = _block_sorted(t, extra=("event_type",))
    n = len(user)
    is_err = np.nan_to_num(
        pa.compute.equal(etype, "error").to_numpy(zero_copy_only=False),
        nan=False,
    ).astype(bool)
    new_run = np.concatenate(
        [[True], (user[1:] != user[:-1]) | (ts[1:] != ts[:-1])]
    )
    run_starts = np.flatnonzero(new_run)
    run_len = np.diff(np.append(run_starts, n))
    run_end = np.repeat(run_starts + run_len - 1, run_len)  # per row
    new_seg = np.concatenate([[True], user[1:] != user[:-1]])
    seg_starts = np.flatnonzero(new_seg)
    seg_start = np.repeat(seg_starts, np.diff(np.append(seg_starts, n)))
    p_err = np.flatnonzero(is_err)
    le = np.searchsorted(p_err, run_end, side="right") - 1
    le_c = np.maximum(le, 0)
    valid = (le >= 0) & (len(p_err) > 0)
    if len(p_err):
        valid &= p_err[le_c] >= seg_start  # same user's segment
        last = np.where(valid, ts[p_err[le_c]], -1)
    else:
        last = np.full(n, -1, dtype=np.int64)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "last_error_us": pa.array(last.astype(np.int64), pa.int64()),
        }
    )


def q_asof_last_error(sf_dir: str):
    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"], require_user=True)
        .sort("user_id")
        .map_batches(asof_last_error_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )


_ASOF_SQL = """
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       coalesce((SELECT epoch_us(max(er.ts)) FROM events er
                 WHERE er.user_id = e.user_id AND er.event_type = 'error'
                   AND er.ts <= e.ts), -1) AS last_error_us
FROM events e WHERE e.user_id IS NOT NULL
"""


# ---------------------------------------------------------------------------
# top-k per group — (value desc, event_id asc) within event_type
# ---------------------------------------------------------------------------

def topk_group(t: pa.Table) -> pa.Table:
    """Arrow in/out: lexsort (value desc, event_id asc) via numpy, take the
    top TOPK_PER_TYPE row indices zero-copy from the group table."""
    vals = t.column("value").to_numpy(zero_copy_only=False)
    eids = t.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eids, -vals))[:TOPK_PER_TYPE]
    top = t.select(["event_type", "event_id", "value"]).take(
        pa.array(order, pa.int64())
    )
    return top.append_column(
        "rank", pa.array(np.arange(1, len(order) + 1), pa.int64())
    )


def q_topk_per_type(sf_dir: str):
    def drop_null_type(t: pa.Table) -> pa.Table:
        # NULL event_type dropped on both engines (mirror filters; Ray's
        # sort groupby cannot order None keys — parity fuzz)
        return t.filter(t.column("event_type").is_valid())

    return (
        _events(sf_dir, ["event_id", "event_type", "value"])
        .map_batches(drop_null_type, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("event_type")
        .map_groups(topk_group, batch_format="pyarrow", **remote_kwargs())
    )


_TOPK_SQL = f"""
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events WHERE event_type IS NOT NULL)
SELECT event_type, event_id, value, rank FROM r WHERE rank <= {TOPK_PER_TYPE}
"""


# ---------------------------------------------------------------------------
# broadcast-join enrichment — per-type mean shipped once via ray.put
# ---------------------------------------------------------------------------

def q_value_deviation(sf_dir: str):
    """Each event's value deviation from its type's global mean. The tiny
    aggregate (one row per type) is broadcast with ray.put and joined inside
    map_batches — no shuffle of the fact table (the broadcast-join pattern
    for small dimension sides at 100 TB)."""
    import ray

    import pyarrow.compute as pc

    def _drop_null_types(t: pa.Table) -> pa.Table:
        # NULL keys match the SQL mirror's inner join (dropped); they must
        # never reach the groupby (Ray's sort shuffle chokes on None keys)
        # nor the broadcast means (index_in would match input NULLs to a
        # null vocabulary entry instead of flagging them absent)
        return t.filter(pc.is_valid(t.column("event_type")))

    means = (
        _events(sf_dir, ["event_type", "value"])
        .map_batches(_drop_null_types, batch_format="pyarrow")
        .groupby("event_type")
        .mean("value")
        .to_pandas()
    )
    # broadcast as parallel Arrow key array + numpy value array so the join
    # inside map_batches is a vectorized index_in + take, not a dict loop
    ref = ray.put(
        (
            pa.array(means["event_type"], pa.string()),
            means["mean(value)"].to_numpy(),
        )
    )

    def enrich(batch: pa.Table) -> pa.Table:
        keys, mus = ray.get(ref)
        idx_arr = pc.index_in(batch.column("event_type"), value_set=keys)
        idx = idx_arr.to_numpy(zero_copy_only=False)
        # rows whose key is absent from the broadcast means (e.g. a NULL
        # event_type) are DROPPED, matching the SQL mirror's inner join —
        # never silently scored against some other type's mean
        valid = (
            ~np.isnan(idx)
            if idx.dtype.kind == "f"
            else idx_arr.is_valid().to_numpy(zero_copy_only=False)
        )
        valid &= np.nan_to_num(
            pc.is_valid(batch.column("event_type")).to_numpy(zero_copy_only=False),
            nan=False,
        ).astype(bool)
        if not valid.all():
            batch = batch.filter(pa.array(valid))
            idx = idx[valid]
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        mu = mus[np.nan_to_num(idx, nan=0).astype(np.int64)]
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "deviation": pa.array(np.round(vals - mu, 6), pa.float64()),
            }
        )

    return _events(sf_dir, ["event_id", "event_type", "value"]).map_batches(
        enrich, batch_format="pyarrow", **remote_kwargs()
    )


_DEVIATION_SQL = """
WITH m AS (SELECT event_type, avg(value) AS mu FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, round(e.value - m.mu, 6) AS deviation
FROM events e JOIN m USING (event_type)
"""


# ---------------------------------------------------------------------------
# sliding-window aggregate — 1 h windows every 30 min (flat-map fan-out:
# each event lands in WINDOW/SLIDE windows, then the salted two-phase count)
# ---------------------------------------------------------------------------

WINDOW_US = 3_600_000_000
SLIDE_US = 1_800_000_000
_N_WINDOWS = WINDOW_US // SLIDE_US


def q_sliding_window_counts(sf_dir: str):
    from ..stages.aggregate import counts_table

    def fan_out(batch: pa.Table) -> pa.Table:
        # NULL event_type dropped on both engines (mirror filters)
        batch = batch.filter(batch.column("event_type").is_valid())
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = ts // SLIDE_US
        starts = np.concatenate(
            [(base - k) * SLIDE_US for k in range(_N_WINDOWS)]
        )
        types = pa.concat_arrays(
            [batch.column("event_type").combine_chunks()] * _N_WINDOWS
        )
        return pa.table(
            {
                "window_us": pa.array(starts, pa.int64()),
                "event_type": types,
            }
        )

    ds = _events(sf_dir, ["ts", "event_type"]).map_batches(
        fan_out, batch_format="pyarrow", **remote_kwargs()
    )
    return counts_table(ds, ["window_us", "event_type"])


_SLIDING_SQL = f"""
SELECT ({_floor_div_sql("epoch_us(ts)", SLIDE_US)} - t.k) * {SLIDE_US}
         AS window_us,
       event_type, count(*) AS n
FROM events, (SELECT unnest([0, 1]) AS k) t
WHERE event_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# range (interval) join — events x events of the same user within ±5 min
# ---------------------------------------------------------------------------

RANGE_US = 5 * 60 * 1_000_000


def range_join_group(df: pd.DataFrame) -> pd.DataFrame:
    """Per-user interval self-join, vectorized: neighbors within ±RANGE_US =
    searchsorted(right edge) - searchsorted(left edge) - self."""
    df = df.sort_values(["ts", "event_id"], kind="stable")
    ts = _ts_us(df["ts"])
    lo = np.searchsorted(ts, ts - RANGE_US, side="left")
    hi = np.searchsorted(ts, ts + RANGE_US, side="right")
    return pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "neighbors": (hi - lo - 1).astype(np.int64),
        }
    )


def range_join_block(t: pa.Table) -> pa.Table:
    """Segment-vectorized interval self-join: segments are packed onto one
    globally sorted axis with >= 2*RANGE_US + 1 of padding between users
    (offset = prefix sum of per-user spans + padding), so ONE global
    searchsorted pair answers every per-user +/-RANGE_US window without a
    per-user loop. Falls back to the per-segment reference only if the
    packed axis would overflow int64 (astronomically wide blocks)."""
    if t.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "neighbors": pa.array([], pa.int64())}
        )
    user, ts, eid = _block_sorted(t)
    n = len(user)
    new_seg = np.concatenate([[True], user[1:] != user[:-1]])
    seg_id = np.cumsum(new_seg) - 1
    seg_starts = np.flatnonzero(new_seg)
    seg_len = np.diff(np.append(seg_starts, n))
    seg_min = ts[seg_starts]
    seg_span = ts[seg_starts + seg_len - 1] - seg_min
    pad = 2 * RANGE_US + 1
    base = np.zeros(len(seg_starts), dtype=np.int64)
    if len(base) > 1:
        np.cumsum(seg_span[:-1] + pad, out=base[1:])
    total = int(base[-1]) + int(seg_span[-1]) + pad if len(base) else 0
    if total < (1 << 62):
        adj = base[seg_id] + (ts - seg_min[seg_id])
        lo = np.searchsorted(adj, adj - RANGE_US, side="left")
        hi = np.searchsorted(adj, adj + RANGE_US, side="right")
        neighbors = (hi - lo - 1).astype(np.int64)
    else:  # unreachable for real timestamps; keep the exact reference path
        neighbors = np.empty(n, dtype=np.int64)
        for s0, ln in zip(seg_starts, seg_len):
            seg = ts[s0:s0 + ln]
            lo = np.searchsorted(seg, seg - RANGE_US, side="left")
            hi = np.searchsorted(seg, seg + RANGE_US, side="right")
            neighbors[s0:s0 + ln] = hi - lo - 1
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "neighbors": pa.array(neighbors, pa.int64()),
        }
    )


def q_range_join_neighbors(sf_dir: str):
    return (
        _events(sf_dir, ["event_id", "ts", "user_id"], require_user=True)
        .sort("user_id")
        .map_batches(range_join_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )


_RANGE_SQL = f"""
SELECT e.event_id, e.user_id,
       (SELECT count(*) FROM events o
        WHERE o.user_id = e.user_id AND o.event_id != e.event_id
          AND abs(epoch_us(o.ts) - epoch_us(e.ts)) <= {RANGE_US}) AS neighbors
FROM events e WHERE e.user_id IS NOT NULL
"""


# ---------------------------------------------------------------------------
# exact distinct count per key — the exact counterpart of the HLL sketch
# (sketch_hll_distinct_users): dedupe (key, value) pairs with a first
# groupby, then count per key. Unlike the sketch, the exchange carries one
# row per DISTINCT pair — the price of exactness the sketch exists to
# avoid; having both makes the trade measurable on the same table.
# ---------------------------------------------------------------------------

def q_distinct_users_exact(sf_dir: str):
    from ..stages.aggregate import counts_table

    def dedupe_fold(t: pa.Table) -> pa.Table:
        # post-groupby rows are one per distinct (event_type, user_id)
        return pa.table({"event_type": t.column("event_type")})

    pairs = (
        _events(sf_dir, ["event_type", "user_id"])
        .groupby(["event_type", "user_id"])
        .count()
        .map_batches(dedupe_fold, batch_format="pyarrow", **remote_kwargs())
    )
    tbl = counts_table(pairs, ["event_type"])
    return tbl.rename_columns(["event_type", "n_users"])


_DISTINCT_SQL = (
    "SELECT event_type, count(DISTINCT user_id) AS n_users"
    " FROM events GROUP BY 1 ORDER BY 1"
)


# ---------------------------------------------------------------------------
# at-least-once delivery dedup — the log-pipeline ingestion cleanup: events
# sharing (user_id, event_type, ts) are redeliveries of one logical event;
# keep the lowest event_id, count the rest. Same sort("user_id") + one
# vectorized block fold as every other per-user op (user_id co-location
# implies composite-key co-location) — measured 13x faster than the
# 3-column hash groupby it replaces (10 s vs 130 s at 10M rows), and it
# reuses the ONE partitioning key the whole event family shares.
# ---------------------------------------------------------------------------

def events_dedup_block(t: pa.Table) -> pa.Table:
    """One user-complete block -> one row per distinct (user, type, ts) run:
    lexsort with event_id as the minor key (so a run's FIRST row carries the
    min id), boundary-compare for runs, run lengths by diff — no per-key
    Python, and the string column is compared through per-block dictionary
    codes, never string-vs-string."""
    if t.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "event_type": pa.array([], pa.string()),
             "ts_us": pa.array([], pa.int64()),
             "keep_event_id": pa.array([], pa.int64()),
             "n_dups": pa.array([], pa.int64())}
        )
    user = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = (
        t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )
    eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    et = t.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    enc = et.dictionary_encode()
    idx = enc.indices
    if idx.null_count:  # NULL event_type is its own group, like SQL's
        idx = pa.compute.fill_null(idx, -1)
    codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, ts, codes, user))
    u, c, s, i = user[order], codes[order], ts[order], eid[order]
    first = np.concatenate(
        [[True], (u[1:] != u[:-1]) | (c[1:] != c[:-1]) | (s[1:] != s[:-1])]
    )
    starts = np.flatnonzero(first)
    lens = np.diff(np.append(starts, len(u)))
    run_codes = c[starts]
    et_out = enc.dictionary.take(
        pa.array(np.where(run_codes >= 0, run_codes, 0),
                 mask=run_codes < 0)
    )
    return pa.table(
        {
            "user_id": pa.array(u[starts], pa.int64()),
            "event_type": et_out,
            "ts_us": pa.array(s[starts], pa.int64()),
            "keep_event_id": pa.array(i[starts], pa.int64()),
            "n_dups": pa.array((lens - 1).astype(np.int64), pa.int64()),
        }
    )


def q_events_dedup(sf_dir: str):
    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"], require_user=True)
        .sort("user_id")
        .map_batches(events_dedup_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )


_EVDEDUP_SQL = """
SELECT user_id, event_type, epoch_us(ts) AS ts_us,
       min(event_id) AS keep_event_id,
       count(*) - 1 AS n_dups
FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# conversion funnel — per-user ordered min-ts cascade over
# view -> click -> purchase (each later step strictly AFTER the previous
# one). Same shape as the other per-user windows: sort("user_id") co-locates
# a user's history, ONE vectorized fold per block (type-code compare +
# masked minimum.reduceat per step — no per-user Python).
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
_INF = np.int64(np.iinfo(np.int64).max)


def funnel_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "stage": pa.array([], pa.int64()),
             "view_us": pa.array([], pa.int64()),
             "click_us": pa.array([], pa.int64()),
             "purchase_us": pa.array([], pa.int64())}
        )
    user, ts, _eid, etype = _block_sorted(t, extra=("event_type",))
    tc = np.zeros(len(user), dtype=np.int8)
    for code, name in enumerate(FUNNEL_STEPS, start=1):
        # fill_null(False): a NULL event_type matches no step (SQL agrees:
        # e.event_type = 'view' is not true for NULL) and must not poison
        # the mask into an object array
        eq = pa.compute.equal(etype, name)
        tc[
            pa.compute.fill_null(eq, False)
            .to_numpy(zero_copy_only=False).astype(bool)
        ] = code
    starts = np.flatnonzero(
        np.concatenate([[True], user[1:] != user[:-1]])
    )
    u_idx = np.cumsum(np.concatenate([[0], (user[1:] != user[:-1]).astype(np.int64)]))
    step_ts = []
    # step 0 has NO lower bound: INT64_MIN, not -1, so pre-epoch (negative)
    # timestamps — corrupted clocks — still enter the 'view' step exactly as
    # the SQL mirror's unconditioned min(ts) does
    prev = np.full(len(starts), np.iinfo(np.int64).min)
    for code in (1, 2, 3):
        valid = (tc == code) & (ts > prev[u_idx])
        m = np.minimum.reduceat(np.where(valid, ts, _INF), starts)
        # reduceat on an all-INF segment yields INF — exactly "unreached"
        m = np.where(prev == _INF, _INF, m)  # can't reach step k without k-1
        step_ts.append(m)
        prev = m
    v, c, p = step_ts
    stage = (
        (v != _INF).astype(np.int64)
        + (c != _INF).astype(np.int64)
        + (p != _INF).astype(np.int64)
    )

    def col(arr):
        return pa.array(
            np.where(arr == _INF, 0, arr), pa.int64(), mask=arr == _INF
        )

    return pa.table(
        {
            "user_id": pa.array(user[starts], pa.int64()),
            "stage": pa.array(stage, pa.int64()),
            "view_us": col(v),
            "click_us": col(c),
            "purchase_us": col(p),
        }
    )


def q_funnel(sf_dir: str):
    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"], require_user=True)
        .sort("user_id")
        .map_batches(funnel_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )


_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
v AS (SELECT user_id, min(epoch_us(ts)) AS view_us FROM events
      WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS click_us
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.view_us GROUP BY 1),
p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_us
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
      GROUP BY 1)
SELECT u.user_id,
       CASE WHEN p.purchase_us IS NOT NULL THEN 3
            WHEN c.click_us IS NOT NULL THEN 2
            WHEN v.view_us IS NOT NULL THEN 1 ELSE 0 END AS stage,
       v.view_us, c.click_us, p.purchase_us
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)
"""


# ---------------------------------------------------------------------------
# cohort retention — users cohorted by first-active week (Monday-aligned
# epoch-week index, pure integer arithmetic mirrored in SQL), counted per
# (cohort_week, week_offset). Per-user work is a block fold after
# sort("user_id"); only (cohort, offset, partial_count) rows shuffle into
# the final tiny groupby.
# ---------------------------------------------------------------------------

# (_US_PER_DAY and _floor_div_sql are defined at module top)


def retention_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"cohort_week": pa.array([], pa.int64()),
             "week_offset": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )
    user, ts, _eid = _block_sorted(t)
    wk = (ts // _US_PER_DAY + 3) // 7  # Monday-aligned weeks since epoch
    # distinct (user, week): rows are user-sorted; sort weeks within user
    order = np.lexsort((wk, user))
    u, w = user[order], wk[order]
    first = np.concatenate([[True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])])
    u, w = u[first], w[first]
    ustart = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
    lens = np.diff(np.append(ustart, len(u)))
    cohort = np.repeat(w[ustart], lens)  # per-user min week = first distinct
    off = w - cohort
    # partial counts per (cohort, offset)
    order = np.lexsort((off, cohort))
    ch, of = cohort[order], off[order]
    first = np.concatenate([[True], (ch[1:] != ch[:-1]) | (of[1:] != of[:-1])])
    starts = np.flatnonzero(first)
    cnt = np.diff(np.append(starts, len(ch)))
    return pa.table(
        {
            "cohort_week": pa.array(ch[starts], pa.int64()),
            "week_offset": pa.array(of[starts], pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def q_retention_cohorts(sf_dir: str):
    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": t.column("cohort_week"),
                "week_offset": t.column("week_offset"),
                "n_users": t.column("sum(cnt)").cast(pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["event_id", "ts", "user_id"], require_user=True)
        .sort("user_id")
        .map_batches(retention_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
        .groupby(["cohort_week", "week_offset"])
        .sum("cnt")
        .map_batches(finish, batch_format="pyarrow", **remote_kwargs())
    )


_RETENTION_SQL = f"""
WITH w AS (
  SELECT user_id,
         {_floor_div_sql(_floor_div_sql("epoch_us(ts)", 86_400_000_000)
                         + " + 3", 7)} AS wk
  FROM events WHERE user_id IS NOT NULL),
d AS (SELECT DISTINCT user_id, wk FROM w),
f AS (SELECT user_id, min(wk) AS cw FROM d GROUP BY 1)
SELECT f.cw AS cohort_week, d.wk - f.cw AS week_offset,
       count(*) AS n_users
FROM d JOIN f USING (user_id) GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# per-key rate limiting — the log-pipeline sampling stage: keep at most
# RATE_LIMIT_N events per (user, day), deterministically the FIRST by
# (ts, event_id). Same sort("user_id") + one vectorized block fold: ranks
# within (user, day) runs come from arange minus repeated run starts —
# no window function, no per-key Python. (Day window so the driver's sparse
# synthetic events actually exceed the limit; the window constant is the
# only knob.)
# ---------------------------------------------------------------------------

RATE_LIMIT_N = 2
_RATE_WINDOW_US = 86_400_000_000


def rate_limit_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "ts_us": pa.array([], pa.int64()),
             "event_type": pa.array([], pa.string())}
        )
    user, ts, eid, etype = _block_sorted(t, extra=("event_type",))
    win = ts // _RATE_WINDOW_US
    brk = np.concatenate(
        [[True], (user[1:] != user[:-1]) | (win[1:] != win[:-1])]
    )
    starts = np.flatnonzero(brk)
    lens = np.diff(np.append(starts, len(user)))
    rank = np.arange(len(user)) - np.repeat(starts, lens)
    keep = rank < RATE_LIMIT_N
    return pa.table(
        {
            "event_id": pa.array(eid[keep], pa.int64()),
            "user_id": pa.array(user[keep], pa.int64()),
            "ts_us": pa.array(ts[keep], pa.int64()),
            "event_type": etype.take(pa.array(np.flatnonzero(keep))),
        }
    )


def q_rate_limit(sf_dir: str):
    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"], require_user=True)
        .sort("user_id")
        .map_batches(rate_limit_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )


_RATE_LIMIT_SQL = f"""
WITH r AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
         row_number() OVER (
           PARTITION BY user_id, {_floor_div_sql("epoch_us(ts)",
                                                 _RATE_WINDOW_US)}
           ORDER BY ts, event_id) AS rk
  FROM events WHERE user_id IS NOT NULL)
SELECT event_id, user_id, ts_us, event_type FROM r
WHERE rk <= {RATE_LIMIT_N}
"""


# ---------------------------------------------------------------------------
# vectorized grok-style field extraction — the flagship's parse idiom on a
# second surface: pull the numeric "k" field out of the JSON-ish props
# string with ONE pc.extract_regex over the whole column (no row loop, no
# json.loads), then a per-batch partial aggregate per event_type so only
# |types| x blocks rows shuffle. avg is derived from the exact integer
# (sum, count) pair AFTER the fold, so distributed order can't drift it.
# ---------------------------------------------------------------------------

_NULL_TYPE_SENTINEL = "\x00"


def props_extract_partial(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    et = t.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    props = t.column("props")
    if isinstance(props, pa.ChunkedArray):
        props = props.combine_chunks()
    ex = pc.extract_regex(props, pattern=r'"k":\s*(?P<k>\d+)')
    k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
    valid = pc.is_valid(k).to_numpy(zero_copy_only=False)
    enc = et.dictionary_encode()
    idx = enc.indices
    has_null_type = bool(idx.null_count)
    if has_null_type:  # NULL event_type groups like SQL's NULL group row
        idx = pc.fill_null(idx, len(enc.dictionary))
    codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    # NaN only appears at invalid positions, which the mask excludes
    kv = k.to_numpy(zero_copy_only=False).astype(np.float64)
    nt = len(enc.dictionary) + (1 if has_null_type else 0)
    n = np.bincount(codes[valid], minlength=nt)
    s = np.bincount(codes[valid], weights=kv[valid],
                    minlength=nt).astype(np.int64)
    types = enc.dictionary.cast(pa.string())
    if has_null_type:
        # Ray's sort-based aggregate cannot partition None keys, so the
        # NULL group travels as the NUL sentinel and is restored to NULL
        # after the fold (no legal event_type contains NUL)
        types = pa.concat_arrays(
            [types, pa.array([_NULL_TYPE_SENTINEL], pa.string())]
        )
    return pa.table(
        {
            "event_type": types,
            "n_with_k": pa.array(n.astype(np.int64), pa.int64()),
            "sum_k": pa.array(s, pa.int64()),
        }
    )


def q_props_stats(sf_dir: str):
    def finish(t: pa.Table) -> pa.Table:
        n = t.column("sum(n_with_k)").to_numpy(zero_copy_only=False)
        s = t.column("sum(sum_k)").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        import pyarrow.compute as pc

        is_sent = pc.equal(et, _NULL_TYPE_SENTINEL)
        if pc.any(is_sent).as_py():  # restore the NULL group post-fold
            et = pc.if_else(is_sent, pa.scalar(None, pa.string()), et)
        return pa.table(
            {
                "event_type": et,
                "n_with_k": pa.array(n.astype(np.int64), pa.int64()),
                "sum_k": pa.array(s.astype(np.int64), pa.int64()),
                "avg_k": pa.array(
                    np.round(s / np.maximum(n, 1), 6), pa.float64()
                ),
            }
        )

    return (
        _events(sf_dir, ["event_type", "props"])
        .map_batches(props_extract_partial, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("event_type")
        .sum(["n_with_k", "sum_k"])
        .map_batches(finish, batch_format="pyarrow", **remote_kwargs())
    )


_PROPS_SQL = r"""
WITH x AS (
  SELECT event_type,
         CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '')
              AS BIGINT) AS k
  FROM events)
SELECT event_type, count(k) AS n_with_k,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       round(coalesce(sum(k), 0)
             / CAST(greatest(count(k), 1) AS DOUBLE), 6) AS avg_k
FROM x GROUP BY 1
"""


# ---------------------------------------------------------------------------
# DAU / WAU active-user rollup — product-analytics daily/trailing-7-day
# distinct users, computed WITHOUT a per-day distinct pass: after
# sort(user_id), one block fold takes each user's distinct active days,
# merges them into covered intervals [day, day+6] (runs where consecutive
# active days are <= 6 apart), and emits per-day DAU partials plus
# interval-boundary +1/-1 deltas. A tiny groupby(day) folds both; the WAU
# series is ONE cumulative sum over the (timeline-bounded) day table on
# the driver. Only O(days) rows ever reach the driver — never a
# (day x user) pair.
# ---------------------------------------------------------------------------

WAU_WINDOW_DAYS = 7


def active_users_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"day": pa.array([], pa.int64()),
             "dau": pa.array([], pa.int64()),
             "delta": pa.array([], pa.int64())}
        )
    user, ts, _eid = _block_sorted(t)
    day = ts // _US_PER_DAY
    # distinct (user, day), sorted by (user, day)
    order = np.lexsort((day, user))
    u, d = user[order], day[order]
    first = np.concatenate([[True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])])
    u, d = u[first], d[first]
    # DAU partials: count per day (each distinct pair contributes once)
    du, dc = np.unique(d, return_counts=True)
    # interval merge per user: new interval when user changes or the gap
    # between consecutive active days exceeds the window span
    W = WAU_WINDOW_DAYS - 1
    brk = np.concatenate([[True], (u[1:] != u[:-1]) | (d[1:] - d[:-1] > W)])
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(d)) - 1
    s_day = d[starts]                # interval covers [s_day, d[end] + W]
    e_day = d[ends] + W + 1          # exclusive end for the +1/-1 diff
    days = np.concatenate([du, s_day, e_day])
    deltas = np.concatenate(
        [np.zeros(len(du), np.int64),
         np.ones(len(s_day), np.int64),
         -np.ones(len(e_day), np.int64)]
    )
    dau = np.concatenate(
        [dc.astype(np.int64),
         np.zeros(len(s_day) + len(e_day), np.int64)]
    )
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "dau": pa.array(dau, pa.int64()),
            "delta": pa.array(deltas, pa.int64()),
        }
    )


def q_active_users(sf_dir: str):
    """(day, dau, wau, stickiness) for every day with >= 1 event: daily and
    trailing-7-day distinct users (day = epoch_us // 86400e6)."""
    folded = (
        _events(sf_dir, ["event_id", "ts", "user_id"], require_user=True)
        .sort("user_id")
        .map_batches(active_users_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
        .groupby("day")
        .sum(["dau", "delta"])
        .to_pandas()  # O(timeline days + interval boundaries), tiny
    )
    if len(folded) == 0 or "day" not in folded.columns:
        return pa.table(
            {"day": pa.array([], pa.int64()),
             "dau": pa.array([], pa.int64()),
             "wau": pa.array([], pa.int64()),
             "stickiness": pa.array([], pa.float64())}
        )
    folded = folded.sort_values("day").reset_index(drop=True)
    wau = folded["sum(delta)"].cumsum()  # active intervals covering each day
    dau = folded["sum(dau)"]
    keep = dau > 0  # boundary-only days (interval ends) are not event days
    out = pa.table(
        {
            "day": pa.array(
                folded["day"][keep].to_numpy().astype(np.int64), pa.int64()
            ),
            "dau": pa.array(dau[keep].to_numpy().astype(np.int64), pa.int64()),
            "wau": pa.array(wau[keep].to_numpy().astype(np.int64), pa.int64()),
            "stickiness": pa.array(
                np.round(
                    dau[keep].to_numpy() / wau[keep].to_numpy(), 6
                ),
                pa.float64(),
            ),
        }
    )
    return out


_ACTIVE_SQL = f"""
WITH p AS (
  SELECT DISTINCT user_id,
         {_floor_div_sql("epoch_us(ts)", 86_400_000_000)} AS day
  FROM events WHERE user_id IS NOT NULL),
days AS (SELECT DISTINCT day FROM p),
dau AS (SELECT day, count(*) AS dau FROM p GROUP BY 1),
wau AS (SELECT d.day, count(DISTINCT p.user_id) AS wau
        FROM days d JOIN p
          ON p.day BETWEEN d.day - {WAU_WINDOW_DAYS - 1} AND d.day
        GROUP BY 1)
SELECT d.day, dau.dau, wau.wau,
       round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
FROM days d JOIN dau USING (day) JOIN wau USING (day)
"""


register("events_distinct_users_exact", q_distinct_users_exact, _DISTINCT_SQL)
register("events_active_users", q_active_users, _ACTIVE_SQL)
register("events_dedup", q_events_dedup, _EVDEDUP_SQL)
register("events_rate_limit", q_rate_limit, _RATE_LIMIT_SQL)
register("events_props_stats", q_props_stats, _PROPS_SQL)
register("events_funnel", q_funnel, _FUNNEL_SQL)
register("events_retention_cohorts", q_retention_cohorts, _RETENTION_SQL)
register("events_sessionization", q_sessionization, _SESSION_SQL)
register("events_range_join_neighbors", q_range_join_neighbors, _RANGE_SQL)
register("events_sliding_window_counts", q_sliding_window_counts, _SLIDING_SQL)
register("events_asof_last_error", q_asof_last_error, _ASOF_SQL)
register("events_topk_per_type", q_topk_per_type, _TOPK_SQL)
register("events_value_deviation", q_value_deviation, _DEVIATION_SQL)


# ---------------------------------------------------------------------------
# per-user lifetime rollup — first/last activity, active-day count, event
# count. Classic two-phase distinct: per-block partials collapse to one row
# per (user, day) BEFORE the exchange (the distinct-day combiner), then a
# (user, day) groupby folds cross-block duplicates, then a per-user groupby
# turns day-rows into active_days via Count. Only |users| x |days| rows ever
# shuffle — never raw events. No co-location assumption (pure aggregates).
# (day constant shared with retention/rate-limit/active-users: _US_PER_DAY)


def _lifetime_partials(batch: pa.Table) -> pa.Table:
    t = batch.combine_chunks() if isinstance(batch, pa.Table) else batch
    user = (
        t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    ts = (
        t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(user) == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "day": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()),
             "min_us": pa.array([], pa.int64()),
             "max_us": pa.array([], pa.int64())}
        )
    day = ts // _US_PER_DAY
    order = np.lexsort((day, user))
    u_s, d_s, t_s = user[order], day[order], ts[order]
    boundary = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    return pa.table(
        {
            "user_id": pa.array(u_s[first], pa.int64()),
            "day": pa.array(d_s[first], pa.int64()),
            "n": pa.array(
                np.diff(np.append(first, len(u_s))).astype(np.int64),
                pa.int64(),
            ),
            "min_us": pa.array(np.minimum.reduceat(t_s, first), pa.int64()),
            "max_us": pa.array(np.maximum.reduceat(t_s, first), pa.int64()),
        }
    )


def _lifetime_rename(t: pa.Table) -> pa.Table:
    """Strip the aggregate-name decorations; schema-less empty shuffle
    partitions pass through typed (blockutil)."""
    from .blockutil import retype_block

    return retype_block(
        t,
        {"user_id": ("user_id", pa.int64()),
         "n": ("sum(n)", pa.int64()),
         "min_us": ("min(min_us)", pa.int64()),
         "max_us": ("max(max_us)", pa.int64())},
    )


def q_user_lifetime(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    per_day = (
        _events(sf_dir, ["user_id", "ts"], require_user=True)
        .map_batches(_lifetime_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["user_id", "day"])
        .aggregate(Sum("n"), Min("min_us"), Max("max_us"))
        .map_batches(_lifetime_rename, batch_format="pyarrow",
                     **remote_kwargs())
    )
    df = (
        per_day.groupby("user_id")
        .aggregate(Count(), Sum("n"), Min("min_us"), Max("max_us"))
        .to_pandas()  # O(|users|)
    )
    if len(df) == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "active_days": pa.array([], pa.int64()),
             "first_us": pa.array([], pa.int64()),
             "last_us": pa.array([], pa.int64()),
             "lifetime_days": pa.array([], pa.float64())}
        )
    df = df.rename(columns={
        "count()": "active_days", "sum(n)": "n_events",
        "min(min_us)": "first_us", "max(max_us)": "last_us",
    })
    # NO final rounding: exact int64 microsecond spans divided once in
    # float64 are bit-identical across engines, where pandas round
    # (half-even) vs DuckDB round (half-away) diverge on reachable inputs
    # (any span that is an odd multiple of 43,200 us) — the same contract
    # the centroid queries adopted after measuring the divergence.
    df["lifetime_days"] = (
        (df["last_us"] - df["first_us"]) / float(_US_PER_DAY)
    )
    df = df.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["user_id", "n_events", "active_days", "first_us", "last_us",
            "lifetime_days"]],
        preserve_index=False,
    )


_FLOOR_DAY_SQL = _floor_div_sql("epoch_us(ts)", _US_PER_DAY)

_LIFETIME_SQL = f"""
SELECT user_id, count(*) AS n_events,
       count(DISTINCT {_FLOOR_DAY_SQL}) AS active_days,
       min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us,
       (max(epoch_us(ts)) - min(epoch_us(ts)))
         / {float(_US_PER_DAY)} AS lifetime_days
FROM events WHERE user_id IS NOT NULL GROUP BY 1 ORDER BY 1
"""

register("events_user_lifetime", q_user_lifetime, _LIFETIME_SQL)


# ---------------------------------------------------------------------------
# hourly anomaly detection — the log-pipeline alerting stage: per-type
# z-score of each hour's event count against that type's hourly
# distribution. Heavy phase (events -> per-(type, hour) counts) is the
# salted two-phase aggregate; the stats fold runs on the driver over the
# tiny timeline-bounded (types x hours) table, like the DAU/WAU rollup.
# Parity contract: every float is derived from EXACTLY-converted int64
# tallies through the same op sequence the SQL mirror writes — variance as
# s2/h - (s/h)^2 (never (s*s)/h: DuckDB would form the product exactly in
# HUGEINT while float64 rounds it, diverging for large counts), sd via
# IEEE sqrt (correctly rounded in both engines), z = 0 when var <= 0.

_US_PER_HOUR = 3_600_000_000
ANOMALY_Z = 3.0


def q_hourly_anomalies(sf_dir: str):
    """(event_type, hour_us, n, z, is_anomaly) for every observed hour."""
    from ..stages.aggregate import counts_by

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # NULL event_type rows are excluded on BOTH engines (mirrored in
        # SQL): alerting is per KNOWN type, and Ray's sort-based count
        # shuffle cannot order None against str anyway
        valid = pc.is_valid(t.column("event_type"))
        if t.num_rows and not pc.all(valid).as_py():
            t = t.filter(valid)
        ts = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour_idx": pa.array(ts // _US_PER_HOUR, pa.int64()),
            }
        )

    df = counts_by(
        _events(sf_dir, ["ts", "event_type"]).map_batches(
            project, batch_format="pyarrow", **remote_kwargs()
        ),
        ["event_type", "hour_idx"],
    ).to_pandas()  # O(types x observed hours)
    if len(df) == 0:
        return pa.table(
            {"event_type": pa.array([], pa.string()),
             "hour_us": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()),
             "z": pa.array([], pa.float64()),
             "is_anomaly": pa.array([], pa.int64())}
        )
    g = df.groupby("event_type")["n"]
    h = g.transform("size").to_numpy(np.float64)
    s = g.transform("sum").to_numpy(np.float64)
    df["n2"] = df["n"] * df["n"]  # per-hour square: exact int64 both engines
    s2 = (
        df.groupby("event_type")["n2"].transform("sum").to_numpy(np.float64)
    )
    n_f = df["n"].to_numpy(np.float64)
    mean = s / h
    var = s2 / h - (s / h) * (s / h)
    with np.errstate(invalid="ignore"):
        sd = np.sqrt(np.where(var > 0, var, 1.0))
    z = np.where(var > 0, (n_f - mean) / sd, 0.0)
    out = pd.DataFrame(
        {
            "event_type": df["event_type"],
            "hour_us": df["hour_idx"].to_numpy(np.int64) * _US_PER_HOUR,
            "n": df["n"].to_numpy(np.int64),
            "z": z,
            "is_anomaly": (np.abs(z) > ANOMALY_Z).astype(np.int64),
        }
    ).sort_values(["event_type", "hour_us"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


_ANOMALY_SQL = f"""
WITH c AS (
  SELECT event_type,
         {_floor_div_sql("epoch_us(ts)", _US_PER_HOUR)} AS hour_idx,
         count(*) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
st AS (
  SELECT event_type, count(*) AS h, sum(n) AS s, sum(n * n) AS s2
  FROM c GROUP BY 1),
jz AS (
  SELECT c.event_type, c.hour_idx * {_US_PER_HOUR} AS hour_us, c.n,
         s2 / CAST(h AS DOUBLE)
           - (s / CAST(h AS DOUBLE)) * (s / CAST(h AS DOUBLE)) AS var,
         s / CAST(h AS DOUBLE) AS mean
  FROM c JOIN st USING (event_type))
SELECT event_type, hour_us, n,
       CASE WHEN var > 0 THEN (n - mean) / sqrt(var) ELSE 0.0 END AS z,
       CAST(abs(CASE WHEN var > 0 THEN (n - mean) / sqrt(var)
                     ELSE 0.0 END) > {ANOMALY_Z} AS INT) AS is_anomaly
FROM jz ORDER BY 1, 2
"""

register("events_hourly_anomalies", q_hourly_anomalies, _ANOMALY_SQL)


# ---------------------------------------------------------------------------
# event-type transition matrix — per-user Markov bigrams: how often type A
# is immediately followed by type B in a user's (ts, event_id)-ordered
# stream. sort(user_id) co-locates each user; ONE vectorized block fold
# emits (src, dst) pair rows only for same-user adjacencies; the salted
# two-phase count folds them and the tiny (types^2) table gets transition
# probabilities as one exact-int float division (no rounding — the
# engine-parity contract used across this module).

def transitions_block(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # vectorized NULL-type drop (mirrors the SQL's WHERE, and keeps the
    # hot path free of per-row Python — no Dataset.filter(lambda))
    et_col = t.column("event_type")
    valid = pc.is_valid(et_col)
    if t.num_rows and not pc.all(valid).as_py():
        t = t.filter(valid)
    if t.num_rows == 0:
        return pa.table(
            {"src": pa.array([], pa.string()),
             "dst": pa.array([], pa.string())}
        )
    user, _ts, _eid, et = _block_sorted(t, extra=("event_type",))
    same_user = user[1:] == user[:-1]
    idx = np.flatnonzero(same_user)
    return pa.table(
        {
            "src": et.take(pa.array(idx)),
            "dst": et.take(pa.array(idx + 1)),
        }
    )


def q_type_transitions(sf_dir: str):
    """(src, dst, n, p) — transition counts and per-src probabilities.
    NULL event_type rows are excluded up front (mirrored in SQL)."""
    import pyarrow.compute as pc

    from ..stages.aggregate import counts_by

    ds = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .sort("user_id")
        .map_batches(transitions_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )
    df = counts_by(ds, ["src", "dst"]).to_pandas()  # O(types^2)
    if len(df) == 0:
        return pa.table(
            {"src": pa.array([], pa.string()),
             "dst": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "p": pa.array([], pa.float64())}
        )
    tot = df.groupby("src")["n"].transform("sum").to_numpy(np.float64)
    df["p"] = df["n"].to_numpy(np.float64) / tot
    df = df.sort_values(["src", "dst"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["src", "dst", "n", "p"]], preserve_index=False
    )


_TRANSITIONS_SQL = """
WITH e AS (SELECT * FROM events WHERE event_type IS NOT NULL),
o AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM e),
c AS (SELECT src, dst, count(*) AS n FROM o WHERE dst IS NOT NULL
      GROUP BY 1, 2),
t AS (SELECT src, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.src, c.dst, c.n, c.n / CAST(t.tot AS DOUBLE) AS p
FROM c JOIN t USING (src) ORDER BY 1, 2
"""

register("events_type_transitions", q_type_transitions, _TRANSITIONS_SQL)


# ---------------------------------------------------------------------------
# SQL window functions — row_number / running SUM / lag, one sorted pass.
# The classic "window function" trio the Dataset API lacks natively,
# expressed as the module's standard sort(user_id) + one segment-vectorized
# block fold (same co-location contract as sessionization above; NO per-user
# Python). Output is per-EVENT (same cardinality as the input), so the fold
# streams block-by-block — nothing materializes. The running sum folds the
# 3dp `value` as exact x1000 integers in (ts, event_id) order, so the float
# result is bit-identical to the mirror's sequential window sum.
# ---------------------------------------------------------------------------


def window_functions_block(t: pa.Table) -> pa.Table:
    """One user-complete block -> (user_seq, running_value, gap_us) per event.

    gap_us is -1 for each user's first event (the mirror COALESCEs its NULL
    lag to -1 so the value-hash contract stays typed)."""
    if t.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "ts_us": pa.array([], pa.int64()),
             "user_seq": pa.array([], pa.int64()),
             "running_value": pa.array([], pa.float64()),
             "gap_us": pa.array([], pa.int64())}
        )
    user, ts, eid, val = _block_sorted(t, extra=("value",))
    # NULL value contributes 0 to the running sum — exactly what the
    # mirror's window sum does by skipping NULLs (NaN would otherwise
    # poison the cumsum and the int cast: parity-fuzz finding)
    val_m = np.rint(
        np.nan_to_num(
            val.to_numpy(zero_copy_only=False).astype(np.float64)
        ) * 1000
    ).astype(np.int64)
    n = len(user)
    starts = np.flatnonzero(
        np.concatenate([[True], user[1:] != user[:-1]])
    )
    lens = np.diff(np.append(starts, n))
    # row_number within user: global arange minus each run's start offset
    user_seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lens) + 1
    # running sum within user: global cumsum minus the prefix before the run
    cum = np.cumsum(val_m)
    prefix = np.concatenate([[0], cum])[starts]  # sum before each run start
    running_m = cum - np.repeat(prefix, lens)
    # lag(ts): previous event's ts within the run; -1 at run starts
    gap = np.empty(n, dtype=np.int64)
    gap[1:] = ts[1:] - ts[:-1]
    gap[starts] = -1
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "user_seq": pa.array(user_seq, pa.int64()),
            "running_value": pa.array(
                np.round(running_m / 1000.0, 6), pa.float64()
            ),
            "gap_us": pa.array(gap, pa.int64()),
        }
    )


def q_window_functions(sf_dir: str):
    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "value"], require_user=True)
        .sort("user_id")
        .map_batches(window_functions_block, batch_format="pyarrow",
                     batch_size=None, **remote_kwargs())
    )


_WINDOW_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(row_number() OVER w AS BIGINT) AS user_seq,
       round(sum(coalesce(CAST(round(value * 1000) AS BIGINT), 0)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) / 1000.0, 6) AS running_value,
       COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS gap_us
FROM events WHERE user_id IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

register("events_window_functions", q_window_functions, _WINDOW_SQL)


# ---------------------------------------------------------------------------
# streaming watermark semantics — tumbling-window counts with late-data
# drop, the core of every streaming log aggregator (Flink/Beam-style):
# an event is LATE iff its timestamp is more than WM_LATENESS behind the
# watermark (the max event time of everything that ARRIVED before it;
# arrival order = event_id). Batch engines usually can't express this
# without a global ordered scan; here the arrival axis is bucketized
# (event_id // WM_BUCKET) so the running maximum factors into (1) per-bucket
# maxima -> one tiny groupby -> driver EXCLUSIVE prefix-max broadcast
# (O(n/WM_BUCKET) rows, the pack_sequences two-phase shape), and (2) an
# in-bucket vectorized running max seeded by the bucket's incoming
# watermark. On-time events fold into 5-minute tumbling windows; dropped
# lates are reported under the window_start_us = -1 sentinel row so the
# drop rate is part of the same gated result.
# ---------------------------------------------------------------------------

WM_BUCKET = 65_536  # arrival-axis bucket (events per prefix cell)
WM_LATENESS = 600_000_000  # 10 min allowed lateness (us)
WM_WINDOW = 300_000_000  # 5 min tumbling window (us)


def _wm_fanout(batch: pa.Table) -> pa.Table:
    eid = (
        batch.column("event_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ts = (
        batch.column("ts").to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").astype(np.int64)
    )
    return pa.table(
        {"bucket": pa.array(eid // WM_BUCKET, pa.int64()),
         "event_id": pa.array(eid, pa.int64()),
         "ts_us": pa.array(ts, pa.int64())}
    )


def q_watermark_counts(sf_dir: str):
    """(window_start_us, n_events): on-time events per 5-min tumbling
    window, plus the dropped-late count under window_start_us = -1."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    from .blockutil import retype_block

    rows = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts"],
        )
        .map_batches(_wm_fanout, batch_format="pyarrow", **remote_kwargs())
        .materialize()  # 24 B/event; read by both phases
    )
    bmax = (
        rows.groupby("bucket")
        .aggregate(Max("ts_us", alias_name="ts_us"))
        .map_batches(
            lambda t: retype_block(
                t, {"bucket": ("bucket", pa.int64()),
                    "ts_us": ("ts_us", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()  # O(n / WM_BUCKET)
    )
    if len(bmax) == 0:
        return pa.table(
            {"window_start_us": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64())}
        )
    bmax = bmax.sort_values("bucket").reset_index(drop=True)
    buckets = bmax["bucket"].to_numpy(np.int64)
    maxima = bmax["ts_us"].to_numpy(np.int64)
    lo = np.int64(-(1 << 62))  # "no prior event" sentinel watermark
    prefix = np.concatenate(
        [[lo], np.maximum.accumulate(maxima)[:-1]]
    )  # EXCLUSIVE prefix max per bucket
    wm_ref = ray.put((buckets, prefix))

    def fold(group: pa.Table) -> pa.Table:
        bks, pfx = ray.get(wm_ref)
        eid = (
            group.column("event_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ts = (
            group.column("ts_us").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(eid, kind="stable")
        ts = ts[order]
        wm_in = pfx[np.searchsorted(bks, eid[order[0]] // WM_BUCKET)]
        run = np.maximum.accumulate(np.maximum(ts, wm_in))
        wm_before = np.concatenate([[wm_in], run[:-1]])
        late = ts < wm_before - WM_LATENESS
        win = (ts[~late] // WM_WINDOW) * WM_WINDOW
        u, c = np.unique(win, return_counts=True)
        n_late = int(late.sum())
        if n_late:
            u = np.concatenate([[np.int64(-1)], u])
            c = np.concatenate([[n_late], c])
        return pa.table(
            {"window_start_us": pa.array(u, pa.int64()),
             "n_events": pa.array(c.astype(np.int64), pa.int64())}
        )

    df = (
        rows.groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(Sum("n_events", alias_name="n_events"))
        .map_batches(
            lambda t: retype_block(
                t, {"window_start_us": ("window_start_us", pa.int64()),
                    "n_events": ("n_events", pa.int64())},
            ),
            batch_format="pyarrow", **remote_kwargs(),
        )
        .to_pandas()
    )
    df = df.sort_values("window_start_us").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["window_start_us", "n_events"]], preserve_index=False
    )


_WATERMARK_SQL = f"""
WITH w AS (
  SELECT epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events),
c AS (SELECT ts_us, (wm IS NOT NULL AND ts_us < wm - {WM_LATENESS}) AS late
      FROM w),
o AS (SELECT (ts_us // {WM_WINDOW}) * {WM_WINDOW} AS window_start_us,
             count(*) AS n_events
      FROM c WHERE NOT late GROUP BY 1),
l AS (SELECT CAST(-1 AS BIGINT) AS window_start_us, count(*) AS n_events
      FROM c WHERE late HAVING count(*) > 0)
SELECT * FROM o UNION ALL SELECT * FROM l ORDER BY 1
"""

register("events_watermark_counts", q_watermark_counts, _WATERMARK_SQL)


# ---------------------------------------------------------------------------
# growth accounting: new users per day (first-seen day) + cumulative total.
# Two-phase: per-block (user, min-day) combiner -> groupby(user).Min (the
# only big exchange — one row per distinct user per block), then per-day
# counts pre-reduced per block -> tiny groupby(day) -> driver cumsum over
# |days| rows. The cumulative sum never touches a per-user row.
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def _first_seen_partials(batch: pa.Table) -> pa.Table:
    # NULL users must collapse into ONE stable group (the SQL mirror has no
    # IS NOT NULL filter, so SQL's NULL group is a real output row). An
    # Arrow-level fill_null to the INT64_MIN sentinel makes that explicit —
    # the previous NaN->int64 numpy cast happened to produce INT64_MIN too,
    # but numpy documents that cast as undefined behavior.
    uid = (
        pc.fill_null(batch.column("user_id"), np.iinfo(np.int64).min)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(uid) == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "day_us": pa.array([], pa.int64())}
        )
    ts = batch.column("ts").to_numpy(zero_copy_only=False)
    day_us = (ts.astype("datetime64[us]").astype(np.int64)
              // _DAY_US) * _DAY_US
    order = np.argsort(uid, kind="stable")
    u, d = uid[order], day_us[order]
    first = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
    return pa.table(
        {"user_id": pa.array(u[first], pa.int64()),
         "day_us": pa.array(np.minimum.reduceat(d, first), pa.int64())}
    )


def _day_count_partials(batch: pa.Table) -> pa.Table:
    from .blockutil import retype_block

    # aggregate output: sparse shuffle partitions arrive SCHEMA-LESS
    batch = retype_block(batch, {"day_us": ("day_us", pa.int64())})
    d = batch.column("day_us").to_numpy(zero_copy_only=False).astype(np.int64)
    u, c = np.unique(d, return_counts=True)
    return pa.table(
        {"day_us": pa.array(u, pa.int64()),
         "new_users": pa.array(c.astype(np.int64), pa.int64())}
    )


def q_new_users_daily(sf_dir: str):
    """(day_us, new_users, cum_users): users counted on their first-seen
    day, with the running total."""
    from ray.data.aggregate import Min

    # day-count partials after the per-user Min are |days| rows per block —
    # folded on the driver (|blocks| x |days|, bounded at any user count).
    # A second distributed groupby here measured ~17 s of fixed hash-shuffle
    # overhead on 1,500 rows at the 10M-event stress — pure constant cost.
    df = (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(_first_seen_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("user_id")
        .aggregate(Min("day_us", alias_name="day_us"))
        .map_batches(_day_count_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .to_pandas()
    )
    if len(df) == 0:  # zero-block dataset -> column-less empty frame
        return pa.table(
            {"day_us": pa.array([], pa.int64()),
             "new_users": pa.array([], pa.int64()),
             "cum_users": pa.array([], pa.int64())}
        )
    df = (
        df.groupby("day_us", as_index=False)["new_users"].sum()
        .sort_values("day_us").reset_index(drop=True)
    )
    df["new_users"] = df["new_users"].astype(np.int64)
    df["cum_users"] = df["new_users"].cumsum().astype(np.int64)
    return pa.Table.from_pandas(
        df[["day_us", "new_users", "cum_users"]], preserve_index=False
    )


# floor (not truncating) day division — pre-1970 timestamps diverge under
# DuckDB's toward-zero // (parity-fuzz finding; same class as the other
# _floor_div_sql call sites). min-then-floor == floor-then-min (monotone).
_NEW_USERS_SQL = f"""
WITH f AS (
  SELECT user_id,
         ({_floor_div_sql("min(epoch_us(ts))", _DAY_US)}) * {_DAY_US}
           AS day_us
  FROM events GROUP BY 1),
d AS (SELECT day_us, count(*) AS new_users FROM f GROUP BY 1)
SELECT day_us, new_users,
       CAST(sum(new_users) OVER (ORDER BY day_us) AS BIGINT) AS cum_users
FROM d ORDER BY day_us
"""

register("events_new_users_daily", q_new_users_daily, _NEW_USERS_SQL)


# ---------------------------------------------------------------------------
# power-user concentration (Pareto report): how much of the event volume
# the top ~1% of users generate. Exact from the count-of-counts histogram
# (the dedup_group_stats pattern): per-user counts fold once (the only big
# exchange, (user, cnt) combiner rows), then per-block count-of-counts
# partials fold on the driver (|blocks| x |distinct counts|, bounded). The
# cutoff is the K-th largest per-user count (K = ceil(1% of users)); ALL
# users tied at the cutoff are included — the inclusive-tie rule every
# histogram-derived order statistic in this repo uses, mirrored in SQL.
# ---------------------------------------------------------------------------

PARETO_PCT = 1  # "top 1%"


def _user_count_partials(batch: pa.Table) -> pa.Table:
    uid = (
        batch.column("user_id").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    u, c = np.unique(uid, return_counts=True)
    return pa.table(
        {"user_id": pa.array(u, pa.int64()),
         "n": pa.array(c.astype(np.int64), pa.int64())}
    )


def _count_hist_partials(batch: pa.Table) -> pa.Table:
    from .blockutil import retype_block

    # aggregate output: sparse shuffle partitions arrive SCHEMA-LESS
    batch = retype_block(batch, {"n": ("n", pa.int64())})
    n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    c, k = np.unique(n, return_counts=True)
    return pa.table(
        {"cnt": pa.array(c, pa.int64()),
         "users": pa.array(k.astype(np.int64), pa.int64())}
    )


def q_power_users_pareto(sf_dir: str):
    """One row: (n_users, n_events, k_target, cutoff, top_users,
    top_events, top_share) — the top-1% concentration report."""
    from ray.data.aggregate import Sum

    hist = (
        _events(sf_dir, ["user_id"])
        .map_batches(_user_count_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(_count_hist_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .to_pandas()
    )
    if len(hist) == 0:  # zero-block dataset -> column-less empty frame
        hist = pd.DataFrame({"cnt": [], "users": []})
    hist = (
        hist.groupby("cnt", as_index=False)["users"].sum()
        .sort_values("cnt", ascending=False).reset_index(drop=True)
    )
    n_users = int(hist["users"].sum())
    n_events = int((hist["cnt"] * hist["users"]).sum())
    if n_users == 0:
        return pa.table(
            {"n_users": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "k_target": pa.array([], pa.int64()),
             "cutoff": pa.array([], pa.int64()),
             "top_users": pa.array([], pa.int64()),
             "top_events": pa.array([], pa.int64()),
             "top_share": pa.array([], pa.float64())}
        )
    # ceil via positive-operand integer division (DuckDB's // truncates
    # toward zero, so the -(-x//y) idiom diverges between engines)
    k = (n_users * PARETO_PCT + 99) // 100
    cum_users = hist["users"].cumsum()
    i = int(np.searchsorted(cum_users.to_numpy(), k, side="left"))
    cutoff = int(hist.loc[i, "cnt"])
    top = hist[hist["cnt"] >= cutoff]
    top_users = int(top["users"].sum())
    top_events = int((top["cnt"] * top["users"]).sum())
    return pa.table(
        {"n_users": pa.array([n_users], pa.int64()),
         "n_events": pa.array([n_events], pa.int64()),
         "k_target": pa.array([int(k)], pa.int64()),
         "cutoff": pa.array([cutoff], pa.int64()),
         "top_users": pa.array([top_users], pa.int64()),
         "top_events": pa.array([top_events], pa.int64()),
         "top_share": pa.array(
             [round(top_events / n_events, 6)], pa.float64()
         )}
    )


_PARETO_SQL = f"""
WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
tot AS (SELECT count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_events
        FROM u),
k AS (SELECT CAST((n_users * {PARETO_PCT} + 99) // 100 AS BIGINT) AS k
      FROM tot),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC) AS rk FROM u),
c AS (SELECT max(CASE WHEN rk = (SELECT k FROM k) THEN n END) AS cutoff
      FROM r),
top AS (SELECT count(*) AS top_users, CAST(sum(n) AS BIGINT) AS top_events
        FROM u WHERE n >= (SELECT cutoff FROM c))
SELECT tot.n_users, tot.n_events, k.k AS k_target,
       CAST(c.cutoff AS BIGINT) AS cutoff,
       top.top_users, top.top_events,
       round(top.top_events / CAST(tot.n_events AS DOUBLE), 6) AS top_share
FROM tot, k, c, top
WHERE tot.n_users > 0
"""

register("events_power_users_pareto", q_power_users_pareto, _PARETO_SQL)
