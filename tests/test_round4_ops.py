"""Round-4 operators: corpus line dedup, event dedup / funnel / retention,
Bloom membership, Count-Min heavy hitters. Planted fixtures exercise the
behaviors the driver's single-line / no-duplicate synthetic data cannot."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_entry_queries import _canon, _to_df


def _write_docs(tmp_path, texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type)."""
    eid, ts, uid, et = zip(*rows)
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def _sql_parity(sf_dir, name):
    import __ray_entry__ as e

    got = _canon(_to_df(e.queries()[name](sf_dir)))
    con = duckdb.connect()
    for t in ("documents", "events"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    exp = _canon(con.execute(e.oracle_sql()[name]).df())
    assert len(got) == len(exp), f"{name}: {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
    return got


# ---------------------------------------------------------------------------
# corpus line dedup
# ---------------------------------------------------------------------------

def test_line_dedup_planted_boilerplate(ray_session, tmp_path):
    from otelcol_con_spaneventtolog_ray.functions.lines import q_line_dedup

    sf = _write_docs(
        tmp_path,
        [
            "unique alpha\nCOOKIE BANNER\ncontent a",
            "other doc\nCOOKIE BANNER\nNAV BAR\ncontent b",
            "NAV BAR\n\nsolo line",           # empty line normalized away
            "totally unique document",
            "",                                # empty doc
            "COOKIE BANNER",                   # only boilerplate -> empty
            "repeat me\nrepeat me\nonce",      # self-repeat is NOT corpus-dup
        ],
    )
    out = _to_df(q_line_dedup(sf)).set_index("doc_id")
    assert out.loc[0, "text_clean"] == "unique alpha\ncontent a"
    assert out.loc[1, "text_clean"] == "other doc\ncontent b"
    assert out.loc[2, "text_clean"] == "solo line"
    assert (out.loc[2, "n_lines"], out.loc[2, "n_kept"]) == (2, 1)
    assert out.loc[3, "text_clean"] == "totally unique document"
    assert out.loc[4, "text_clean"] == "" and out.loc[4, "n_lines"] == 0
    assert out.loc[5, "text_clean"] == "" and out.loc[5, "n_kept"] == 0
    # a line repeated within ONE doc only is kept (per-doc distinct counting)
    assert out.loc[6, "text_clean"] == "repeat me\nrepeat me\nonce"
    _sql_parity(sf, "text_line_dedup")


def test_line_dedup_broadcast_cap_fail_fast(ray_session, tmp_path, monkeypatch):
    from otelcol_con_spaneventtolog_ray.functions import lines

    sf = _write_docs(tmp_path, ["dup line\na", "dup line\nb"])
    monkeypatch.setattr(lines, "LINE_BROADCAST_MAX", 0)
    with pytest.raises(ValueError, match="common-line set"):
        lines.q_line_dedup(sf)


def test_line_dedup_batch_hash_matches_scalar(ray_session, tmp_path):
    """The count pass and the clean pass must hash a line identically to the
    scalar content hash, or membership silently breaks."""
    from otelcol_con_spaneventtolog_ray.functions.lines import (
        common_line_hashes,
    )
    from otelcol_con_spaneventtolog_ray.functions.texthash import (
        content_hash_scalar,
    )

    sf = _write_docs(tmp_path, ["shared line\nx", "shared line\ny", "z"])
    h1, h2 = common_line_hashes(sf)
    assert len(h1) == 1
    s1, s2 = content_hash_scalar("shared line")
    assert int(h1[0]) == s1 and int(h2[0]) == s2


# ---------------------------------------------------------------------------
# event dedup / funnel / retention
# ---------------------------------------------------------------------------

def test_events_dedup_planted_redeliveries(ray_session, tmp_path):
    T = 1_700_000_000_000_000
    sf = _write_events(
        tmp_path,
        [
            (10, T, 1, "click"),
            (11, T, 1, "click"),       # redelivery (same user/type/ts)
            (12, T, 1, "view"),        # same ts, different type: distinct
            (13, T + 5, 1, "click"),   # different ts: distinct
            (14, T, 2, "click"),       # different user: distinct
            (9, T, 1, "click"),        # redelivery with LOWER id -> keeper
        ],
    )
    got = _sql_parity(sf, "events_dedup")
    import __ray_entry__ as e

    out = _to_df(e.queries()["events_dedup"](sf))
    row = out[(out.user_id == 1) & (out.event_type == "click")
              & (out.ts_us == T)]
    assert row.keep_event_id.item() == 9 and row.n_dups.item() == 2
    assert len(out) == 4 and len(got) == 4


def test_funnel_strict_ordering_semantics(ray_session, tmp_path):
    T = 1_700_000_000_000_000
    sf = _write_events(
        tmp_path,
        [
            # user 1: full funnel in order
            (1, T + 1, 1, "view"), (2, T + 2, 1, "click"),
            (3, T + 3, 1, "purchase"),
            # user 2: click BEFORE view -> stage 1 only
            (4, T + 1, 2, "click"), (5, T + 2, 2, "view"),
            # user 3: click at the SAME ts as view -> strict '>' rejects it
            (6, T + 1, 3, "view"), (7, T + 1, 3, "click"),
            # user 4: purchase without click -> stage 1
            (8, T + 1, 4, "view"), (9, T + 2, 4, "purchase"),
            # user 5: no funnel events at all -> stage 0
            (10, T + 1, 5, "error"),
        ],
    )
    _sql_parity(sf, "events_funnel")
    import __ray_entry__ as e

    out = _to_df(e.queries()["events_funnel"](sf)).set_index("user_id")
    assert out.loc[1, "stage"] == 3
    assert out.loc[1, "purchase_us"] == T + 3
    assert out.loc[2, "stage"] == 1
    assert out.loc[3, "stage"] == 1  # same-ts click does not advance
    assert out.loc[4, "stage"] == 1  # purchase can't skip click
    assert out.loc[5, "stage"] == 0
    assert pd.isna(out.loc[2, "click_us"])


def test_retention_week_arithmetic(ray_session, tmp_path):
    # epoch day 0 = Thursday 1970-01-01; Monday-aligned week index is
    # (days + 3) // 7: day 4 (Mon Jan 5) starts week 1.
    US_DAY = 86_400_000_000
    sf = _write_events(
        tmp_path,
        [
            (1, 0, 1, "view"),                 # Thu day 0 -> week 0 cohort
            (2, 4 * US_DAY, 1, "view"),        # Mon day 4 -> week 1: offset 1
            (3, 10 * US_DAY, 1, "view"),       # Sun day 10 -> still week 1
            (4, 11 * US_DAY, 2, "view"),       # Mon day 11 -> week 2 cohort
        ],
    )
    _sql_parity(sf, "events_retention_cohorts")
    import __ray_entry__ as e

    out = _to_df(e.queries()["events_retention_cohorts"](sf))
    rows = {(r.cohort_week, r.week_offset): r.n_users
            for r in out.itertuples()}
    assert rows == {(0, 0): 1, (0, 1): 1, (2, 0): 1}


# ---------------------------------------------------------------------------
# Bloom membership
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fpr_bound(ray_session, tmp_path):
    """5000 users, 100 purchasers: zero false negatives (structural) and
    FPR far below the analytic (k*n/m)^k ~ 1e-7 bound (we allow <=5 of
    4900 to keep the test hash-agnostic)."""
    T = 1_700_000_000_000_000
    rows = []
    for u in range(5000):
        rows.append((2 * u, T + u, u, "view"))
        if u % 50 == 0:
            rows.append((2 * u + 1, T + u + 1, u, "purchase"))
    sf = _write_events(tmp_path, rows)
    import __ray_entry__ as e

    out = _to_df(e.queries()["sketch_bloom_users"](sf))
    assert len(out) == 5000
    assert not ((~out.bloom_hit) & out.true_hit).any(), "false negative!"
    assert out.true_hit.sum() == 100
    assert (out.bloom_hit & ~out.true_hit).sum() <= 5


def test_bloom_partial_or_merge_equals_single_fold(ray_session):
    from otelcol_con_spaneventtolog_ray.functions.sketch import bloom_fold

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 62, size=2000, dtype=np.int64)
    whole = bloom_fold(keys)
    merged = bloom_fold(keys[:700]) | bloom_fold(keys[700:])
    assert (whole == merged).all()


def test_event_ops_handle_null_event_type(ray_session, tmp_path):
    """A NULL event_type row (schema-legal) must group/skip like the SQL
    mirrors do, not crash the vectorized folds (review finding)."""
    T = 1_700_000_000_000_000
    eid = [1, 2, 3, 4]
    ts = [T, T, T + 5, T + 6]
    uid = [1, 1, 1, 2]
    et = ["view", None, None, "click"]
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array([1.0] * 4, pa.float64()),
            "props": pa.array(['{"k": 7}'] * 4, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    for name in ("events_dedup", "events_funnel", "events_props_stats",
                 "events_rate_limit"):
        _sql_parity(str(tmp_path), name)


def test_corpus_report_null_text_and_comma_lang(ray_session, tmp_path):
    """NULL text contributes nothing (not INT64_MIN garbage); a lang value
    containing ',' is ONE language; NULL lang/source are excluded like
    SQL's count(DISTINCT) (review findings)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["hello world", None, "", "a b c"], pa.string()),
            "lang": pa.array(["en,fr", None, "en", "de"], pa.string()),
            "source": pa.array(["w1", "w2", None, "w1"], pa.string()),
            "n_chars": pa.array([11, 0, 0, 5], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    got = _sql_parity(str(tmp_path), "corpus_report")
    row = got.iloc[0]
    assert row.n_docs == 4 and row.n_tokens == 2 + 0 + 1 + 3
    assert row.n_langs == 3 and row.n_sources == 2
    assert row.n_empty == 1  # the "" doc; the NULL doc is not "empty"
    # empty-string lang is a DISTINCT value (not dropped by the fan-in);
    # NULL lang/source are excluded — and the token/vocab ops plus the
    # mixture planner survive the same adversarial rows with SQL parity
    tbl2 = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["x y", None, "x z"], pa.string()),
            "lang": pa.array(["", "en", "en"], pa.string()),
            "source": pa.array(["w1", None, "w1"], pa.string()),
            "n_chars": pa.array([3, 0, 3], pa.int64()),
        }
    )
    pq.write_table(tbl2, os.path.join(tmp_path, "documents.parquet"))
    out = _sql_parity(str(tmp_path), "corpus_report")
    assert out.iloc[0].n_langs == 2  # '' and 'en'
    for name in ("corpus_source_mixture", "text_tokenize_ids",
                 "text_top_tokens", "text_top_bigrams"):
        _sql_parity(str(tmp_path), name)


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------

def _scalar_bpe(texts, n_merges):
    """Trivial Python BPE mirror: greedy left-to-right merge application,
    exact global top pair per round, ties by (left, right) ascending."""
    import re

    ws = re.compile(r"\s+", re.ASCII)
    docs = [[t for t in ws.split(x) if t] for x in texts]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for d in docs:
            for a, b in zip(d, d[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        new_docs = []
        for d in docs:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    out.append(a + "\x1f" + b)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            new_docs.append(out)
        docs = new_docs
    return merges


def test_bpe_merges_match_scalar_mirror(ray_session, tmp_path):
    rng = np.random.default_rng(17)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(60)
    ] + ["aa aa aa aa aa"]  # self-run: exercises greedy non-overlap
    sf = _write_docs(tmp_path, texts)
    import __ray_entry__ as e

    out = _to_df(e.queries()["text_bpe_merges"](sf))
    exp = _scalar_bpe(texts, len(out))
    assert len(out) > 0
    for i, (a, b, n) in enumerate(exp):
        assert out.iloc[i]["merged"] == (a + "\x1f" + b).replace("\x1f", " ")
        assert out.iloc[i]["n"] == n


def test_bpe_merge_once_run_parity():
    """'x x x x x' merging (x, x) -> [xx, xx, x]: even-offset candidates
    merge, the odd ones are consumed."""
    from otelcol_con_spaneventtolog_ray.functions.bpe import _merge_once

    syms = np.array(["x"] * 5, dtype=object)
    offs = np.array([0, 5], dtype=np.int64)
    out, new_offs = _merge_once(syms, offs, "x", "x")
    assert list(out) == ["x\x1fx", "x\x1fx", "x"]
    assert list(new_offs) == [0, 3]
    # doc boundary blocks a merge
    syms = np.array(["x", "x"], dtype=object)
    offs = np.array([0, 1, 2], dtype=np.int64)
    out, new_offs = _merge_once(syms, offs, "x", "x")
    assert list(out) == ["x", "x"] and list(new_offs) == [0, 1, 2]


# ---------------------------------------------------------------------------
# Count-Min heavy hitters
# ---------------------------------------------------------------------------

def test_cms_never_underestimates_and_error_bound(ray_session, tmp_path):
    """Zipf-ish corpus: est >= true for every probed token and the additive
    error stays within e/W * N (the CMS guarantee at delta = e^-D)."""
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(2000)]
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=200, p=weights)) for _ in range(200)
    ]
    sf = _write_docs(tmp_path, texts)
    import __ray_entry__ as e

    out = _to_df(e.queries()["sketch_cms_top_tokens"](sf))
    from otelcol_con_spaneventtolog_ray.functions.sketch import CMS_W

    n_tokens = 200 * 200
    bound = np.e * n_tokens / CMS_W
    assert (out.est_n >= out.n).all()
    assert ((out.est_n - out.n) <= bound).all()
    # the exact side must agree with a scalar recount of the top token
    top = out.iloc[0]
    true_n = sum(t.split().count(top.token) for t in texts)
    assert top.n == true_n


def test_rate_limit_keeps_first_n_per_user_day(ray_session, tmp_path):
    """5 same-day events for one user -> first RATE_LIMIT_N by (ts,
    event_id) survive; day boundaries reset the budget; ties break by id."""
    US_DAY = 86_400_000_000
    D = 19_000 * US_DAY  # some day boundary
    sf = _write_events(
        tmp_path,
        [
            (1, D + 100, 1, "view"), (2, D + 200, 1, "view"),
            (3, D + 300, 1, "view"), (4, D + 400, 1, "view"),
            (5, D + 100, 2, "view"),              # other user unaffected
            (6, D + US_DAY + 10, 1, "view"),      # next day: budget resets
            (8, D + 50, 1, "view"), (7, D + 50, 1, "view"),  # tie -> id 7 first
        ],
    )
    _sql_parity(sf, "events_rate_limit")
    import __ray_entry__ as e

    out = _to_df(e.queries()["events_rate_limit"](sf))
    kept_u1_d0 = sorted(
        out[(out.user_id == 1) & (out.ts_us < D + US_DAY)].event_id
    )
    assert kept_u1_d0 == [7, 8]  # the two earliest (ts, id) pairs
    assert 6 in set(out.event_id)
    assert 5 in set(out.event_id)


# ---------------------------------------------------------------------------
# duplicated-span profiling
# ---------------------------------------------------------------------------

def test_dup_spans_cross_doc_only(ray_session, tmp_path):
    """A window shared by two DOCS is duplicated; a doc repeating its own
    window is not (distinct-docs >= 2 semantics)."""
    shared = " ".join(f"w{i}" for i in range(10))          # one exact 10-gram
    sf = _write_docs(
        tmp_path,
        [
            f"{shared} tail one alpha beta gamma delta epsilon zeta eta",
            f"head two {shared} trailing words here make it long enough",
            # 9 words < K -> ONE whole-doc window, unique
            "short doc with nine words only right here now",
            # self-repeat: same 10-gram twice in ONE doc, nowhere else
            f"{'x ' * 10}{'x ' * 10}".strip(),
        ],
    )
    _sql_parity(sf, "text_dup_spans")
    import __ray_entry__ as e

    out = _to_df(e.queries()["text_dup_spans"](sf)).set_index("doc_id")
    assert out.loc[0, "n_dup_windows"] == 1
    assert out.loc[1, "n_dup_windows"] == 1
    assert out.loc[2, "n_dup_windows"] == 0
    assert out.loc[2, "n_windows"] == 1        # short-doc single window
    # doc 3: all-x windows are identical -> ONE distinct window, own-doc only
    assert out.loc[3, "n_windows"] == 1
    assert out.loc[3, "n_dup_windows"] == 0


def test_funnel_block_matches_bruteforce_oracle(ray_session, tmp_path):
    """Randomized pin: the vectorized block fold must equal a per-user
    scalar recomputation of the strict min-ts cascade on 300 users x ~2000
    events with heavy ts ties."""
    rng = np.random.default_rng(42)
    n = 2000
    T = 1_700_000_000_000_000
    rows = [
        (i, T + int(rng.integers(0, 500)) * 1_000_000,  # coarse ts => ties
         int(rng.integers(0, 300)),
         ["view", "click", "purchase", "error"][rng.integers(0, 4)])
        for i in range(n)
    ]
    sf = _write_events(tmp_path, rows)
    import __ray_entry__ as e

    out = _to_df(e.queries()["events_funnel"](sf)).set_index("user_id")

    byuser = {}
    for _eid, ts, uid, et in rows:
        byuser.setdefault(uid, []).append((ts, et))
    for uid, evs in byuser.items():
        v = min((t for t, k in evs if k == "view"), default=None)
        c = (min((t for t, k in evs if k == "click" and t > v), default=None)
             if v is not None else None)
        p = (min((t for t, k in evs if k == "purchase" and t > c),
                 default=None) if c is not None else None)
        stage = 3 if p is not None else 2 if c is not None else (
            1 if v is not None else 0)
        assert out.loc[uid, "stage"] == stage, uid
        for col, val in (("view_us", v), ("click_us", c),
                         ("purchase_us", p)):
            got = out.loc[uid, col]
            assert (pd.isna(got) and val is None) or got == val, (uid, col)


def test_events_dedup_block_matches_pandas_oracle(ray_session, tmp_path):
    """Randomized pin: sort+fold dedup equals a pandas groupby on data with
    planted redeliveries (coarse ts + few types force collisions)."""
    rng = np.random.default_rng(9)
    n = 3000
    T = 1_700_000_000_000_000
    rows = [
        (int(rng.integers(0, 1 << 40)),
         T + int(rng.integers(0, 50)) * 1_000_000,
         int(rng.integers(0, 40)),
         ["a", "b"][rng.integers(0, 2)])
        for _ in range(n)
    ]
    sf = _write_events(tmp_path, rows)
    import __ray_entry__ as e

    out = _to_df(e.queries()["events_dedup"](sf))
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type"])
    exp = (
        df.groupby(["user_id", "event_type", "ts_us"])
        .agg(keep_event_id=("event_id", "min"), n=("event_id", "size"))
        .reset_index()
    )
    exp["n_dups"] = exp.pop("n") - 1
    key = ["user_id", "event_type", "ts_us"]
    merged = out.sort_values(key).reset_index(drop=True)
    exps = exp[merged.columns].sort_values(key).reset_index(drop=True)
    assert (merged.n_dups > 0).any()  # collisions actually planted
    pd.testing.assert_frame_equal(merged, exps, check_dtype=False)


def test_dup_spans_run_cap_fail_fast(ray_session, tmp_path, monkeypatch):
    from otelcol_con_spaneventtolog_ray.functions import decontam

    shared = " ".join(f"b{i}" for i in range(10))
    sf = _write_docs(tmp_path, [f"{shared} u{j}" for j in range(4)])
    monkeypatch.setattr(decontam, "DUP_SPAN_MAX_RUN", 2)
    with pytest.raises((ValueError, Exception), match="occurs in"):
        _to_df(decontam.q_dup_spans(sf))


NEW_OPS_EMPTY = [
    "text_line_dedup", "text_dup_spans", "events_dedup", "events_funnel",
    "events_retention_cohorts", "events_rate_limit", "events_props_stats",
    "sketch_bloom_users", "sketch_cms_top_tokens",
    "text_gopher_rules", "text_idf_top_terms", "events_user_lifetime",
    "corpus_source_overlap", "text_perplexity_buckets",
    "corpus_token_budget",
]


@pytest.mark.parametrize("name", NEW_OPS_EMPTY)
def test_new_ops_survive_empty_input(ray_session, tmp_path, name):
    """Empty documents/events tables must yield empty results, not crash
    (schema-loss through empty Ray datasets is a real hazard)."""
    _write_docs(tmp_path, [])
    _write_events_empty(tmp_path)
    import __ray_entry__ as e

    out = _to_df(e.queries()[name](str(tmp_path)))
    assert len(out) == 0


def _write_events_empty(tmp_path):
    tbl = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))


def test_cms_linearity(ray_session):
    from otelcol_con_spaneventtolog_ray.functions.sketch import cms_fold

    rng = np.random.default_rng(3)
    h = rng.integers(0, 1 << 62, size=5000, dtype=np.int64).astype(np.uint64)
    whole = cms_fold(h)
    merged = cms_fold(h[:2222]) + cms_fold(h[2222:])
    assert (whole == merged).all()


def test_footer_helpers_accept_directories(tmp_path):
    """column_stats_bounds / file_num_rows over a DIRECTORY of parquet
    files — the shape a web-scale table actually has."""
    from otelcol_con_spaneventtolog_ray.parquet_stats import (
        column_stats_bounds,
        file_num_rows,
    )

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([5, 7], pa.int64())}), d / "a.parquet"
    )
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 9], pa.int64())}), d / "b.parquet"
    )
    assert file_num_rows(str(d)) == 4
    assert column_stats_bounds(str(d), "doc_id") == (1, 9)
    assert file_num_rows(str(d / "a.parquet")) == 2


def test_minhash_and_dup_spans_on_directory_table(ray_session, tmp_path):
    """documents.parquet as a DIRECTORY of files (the web-scale layout):
    the footer planning, pushdown range reads, and sorted folds must give
    byte-identical results to the single-file layout."""
    rng = np.random.default_rng(23)
    words = "alpha beta gamma delta epsilon zeta".split()
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(30)]
    texts += [texts[0] + " zeta", texts[5] + " beta"]  # planted near-dups
    ids = list(range(len(texts)))

    single = tmp_path / "single"
    single.mkdir()
    _write_docs(single, texts, ids)

    multi = tmp_path / "multi"
    (multi / "documents.parquet").mkdir(parents=True)
    half = len(texts) // 2
    for part, (i, t) in enumerate(((0, slice(0, half)), (1, slice(half, None)))):
        tbl = pa.table(
            {
                "doc_id": pa.array(ids[t], pa.int64()),
                "text": pa.array(texts[t], pa.string()),
                "lang": pa.array(["en"] * len(ids[t])),
                "source": pa.array(["web"] * len(ids[t])),
                "n_chars": pa.array([len(x) for x in texts[t]], pa.int64()),
            }
        )
        pq.write_table(
            tbl, multi / "documents.parquet" / f"part-{part}.parquet"
        )

    import __ray_entry__ as e

    qs = e.queries()
    for name in ("dedup_minhash_near_dups", "text_dup_spans"):
        a = _canon(_to_df(qs[name](str(single))))
        b = _canon(_to_df(qs[name](str(multi))))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert len(a) > 0, name


def test_active_users_interval_merge_semantics(ray_session, tmp_path):
    """WAU counts a user for every day within 6 days AFTER an active day;
    a >6-day gap starts a new interval (the merge rule); DAU only counts
    the active day itself."""
    US_DAY = 86_400_000_000
    sf = _write_events(
        tmp_path,
        [
            (1, 0 * US_DAY, 1, "view"),     # user 1 active day 0
            (2, 10 * US_DAY, 1, "view"),    # and day 10 (gap > 6: new interval)
            (3, 3 * US_DAY, 2, "view"),     # user 2 active day 3
            (4, 10 * US_DAY, 2, "view"),    # and day 10 (gap 7 > 6)
        ],
    )
    _sql_parity(sf, "events_active_users")
    import __ray_entry__ as e

    out = _to_df(e.queries()["events_active_users"](sf)).set_index("day")
    assert out.loc[0, "dau"] == 1 and out.loc[0, "wau"] == 1
    # day 3: user 1 covered (day 0 + 6 >= 3) + user 2 active
    assert out.loc[3, "dau"] == 1 and out.loc[3, "wau"] == 2
    # day 10: both active; neither prior interval reaches (0+6<10, 3+6<10)
    assert out.loc[10, "dau"] == 2 and out.loc[10, "wau"] == 2


# ---------------------------------------------------------------------------
# Gopher-style rule filter
# ---------------------------------------------------------------------------

def test_gopher_rules_each_rule_trips(ray_session, tmp_path):
    """One planted doc per rule violation; every other rule passes on that
    doc, so each flag column is exercised independently."""
    filler = ["word"] * 26  # 4-char alpha tokens keep mean_len ~4
    docs = [
        " ".join(filler + ["the", "a", "good", "text"]),      # 0: keeps
        "the a tiny document here",                            # 1: too short
        " ".join(["word"] * 96 + ["the", "a", "x", "y"]),      # 2: too long
        " ".join(["extraordinarily"] * 28 + ["the", "a"]),     # 3: mean_len
        " ".join(["12345"] * 28 + ["the", "a"]),               # 4: alpha
        " ".join(["word"] * 30),                               # 5: stopwords
    ]
    sf = _write_docs(tmp_path, docs)
    _write_events_empty(tmp_path)
    got = _sql_parity(sf, "text_gopher_rules").set_index("doc_id")
    assert got.loc[0, "keep"] == 1
    assert (got.loc[0, ["r_nwords", "r_mean_len", "r_alpha", "r_stop"]]
            == 1).all()
    for doc, rule in [(1, "r_nwords"), (2, "r_nwords"), (3, "r_mean_len"),
                      (4, "r_alpha"), (5, "r_stop")]:
        assert got.loc[doc, rule] == 0, (doc, rule)
        assert got.loc[doc, "keep"] == 0
        others = {"r_nwords", "r_mean_len", "r_alpha", "r_stop"} - {rule}
        assert (got.loc[doc, sorted(others)] == 1).all(), (doc, rule)


def test_gopher_rules_discriminate_on_driver_data(ray_session):
    """At sf0.001 the rules must produce BOTH kept and dropped docs — a
    filter that keeps (or drops) everything is vacuous."""
    import __ray_entry__ as e

    out = _to_df(e.queries()["text_gopher_rules"]("/root/testdata/sf0.001"))
    assert 0 < out["keep"].sum() < len(out)


# ---------------------------------------------------------------------------
# IDF top terms
# ---------------------------------------------------------------------------

def test_idf_df_counts_planted(ray_session, tmp_path):
    """df counts distinct DOCS per token (repeats inside a doc count once);
    idf = round(ln(N/df), 6)."""
    sf = _write_docs(
        tmp_path,
        ["apple banana", "apple", "apple cherry cherry"],
    )
    _write_events_empty(tmp_path)
    got = _sql_parity(sf, "text_idf_top_terms").set_index("token")
    assert got.loc["apple", "df"] == 3
    assert got.loc["banana", "df"] == 1
    assert got.loc["cherry", "df"] == 1  # twice in one doc -> df 1
    assert got.loc["apple", "idf"] == round(float(np.log(1.0)), 6)
    assert got.loc["cherry", "idf"] == round(float(np.log(3.0)), 6)
    # rank: df desc, token asc
    assert list(got.sort_values("rank").index) == ["apple", "banana",
                                                   "cherry"]


# ---------------------------------------------------------------------------
# per-user lifetime rollup
# ---------------------------------------------------------------------------

def test_user_lifetime_planted(ray_session, tmp_path):
    day = 86_400_000_000
    rows = [
        (1, 10 * day + 100, 7, "view"),     # user 7: day 10 twice, day 12
        (2, 10 * day + 500, 7, "view"),
        (3, 12 * day + 9, 7, "click"),
        (4, 11 * day, 8, "view"),           # user 8: single event
    ]
    sf = _write_events(tmp_path, rows)
    _write_docs(tmp_path, ["x"])
    got = _sql_parity(sf, "events_user_lifetime").set_index("user_id")
    assert got.loc[7, "n_events"] == 3
    assert got.loc[7, "active_days"] == 2
    assert got.loc[7, "first_us"] == 10 * day + 100
    assert got.loc[7, "last_us"] == 12 * day + 9
    assert got.loc[7, "lifetime_days"] == (2 * day - 91) / float(day)
    assert got.loc[8, "n_events"] == 1
    assert got.loc[8, "active_days"] == 1
    assert got.loc[8, "lifetime_days"] == 0.0


# ---------------------------------------------------------------------------
# TPC-H Q3-shape fact-fact hash join
# ---------------------------------------------------------------------------

def _write_q3_fixture(tmp_path, orders_rows, lineitem_rows):
    """orders_rows: (okey, odate_day, priority); lineitem_rows:
    (okey, price, disc, shipdate_day). Days are offsets from 1995-01-01."""
    base = np.datetime64("1995-01-01", "us").astype("int64")
    day = 86_400_000_000
    ok, od, op = zip(*orders_rows) if orders_rows else ((), (), ())
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(list(ok), pa.int64()),
                "o_custkey": pa.array([1] * len(ok), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(ok), pa.string()),
                "o_totalprice": pa.array([0.0] * len(ok), pa.float64()),
                "o_orderdate": pa.array(
                    np.array([base + d * day for d in od],
                             dtype=np.int64).astype("datetime64[us]")
                ),
                "o_orderpriority": pa.array(list(op), pa.string()),
            }
        ),
        os.path.join(tmp_path, "orders.parquet"),
    )
    lk, lp, ld, ls = zip(*lineitem_rows) if lineitem_rows else ((), (), (), ())
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(list(lk), pa.int64()),
                "l_extendedprice": pa.array(list(lp), pa.float64()),
                "l_discount": pa.array(list(ld), pa.float64()),
                "l_shipdate": pa.array(
                    np.array([base + d * day for d in ls],
                             dtype=np.int64).astype("datetime64[us]")
                ),
            }
        ),
        os.path.join(tmp_path, "lineitem.parquet"),
    )
    return str(tmp_path)


def test_order_revenue_topk_join_semantics(ray_session, tmp_path):
    """Inner-join semantics + integer-exact revenue + deterministic
    (revenue desc, orderkey asc) tie-break, against the DuckDB mirror."""
    import __ray_entry__ as e
    from otelcol_con_spaneventtolog_ray.functions.relational import Q3_CUTOFF

    cut = (np.datetime64(Q3_CUTOFF) - np.datetime64("1995-01-01")).astype(
        "timedelta64[D]"
    ).astype(int)
    orders = [
        (1, cut - 10, "1-URGENT"),     # open, two post-cutoff lines
        (2, cut - 10, "2-HIGH"),       # open, line shipped BEFORE cutoff
        (3, cut - 5, "3-MEDIUM"),      # open, one line; revenue ties okey 6
        (4, cut + 5, "5-LOW"),         # ordered AFTER cutoff -> excluded
        (6, cut - 5, "4-NOT SPECIFIED"),
    ]
    lines = [
        (1, 100.0, 0.10, cut + 1),     # 100 * .9  = 90
        (1, 200.0, 0.00, cut + 2),     # + 200     = 290
        (2, 500.0, 0.00, cut - 1),     # pre-cutoff ship -> no revenue row
        (3, 50.0, 0.00, cut + 3),      # 50 -- ties with okey 6
        (6, 50.0, 0.00, cut + 3),
        (9, 999.0, 0.00, cut + 1),     # no matching open order
        (4, 123.0, 0.00, cut + 1),     # order excluded by orderdate
    ]
    sf = _write_q3_fixture(tmp_path, orders, lines)
    got = _to_df(e.queries()["rel_order_revenue_topk"](sf))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf, t + '.parquet')}')"
        )
    exp = con.execute(e.oracle_sql()["rel_order_revenue_topk"]).df()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(exp), check_dtype=False, check_exact=True
    )
    got = got.set_index("o_orderkey")
    assert list(got.index) == [1, 3, 6]           # 4 and 9 dropped by join
    assert got.loc[1, "revenue"] == 290.0
    assert got.loc[1, "rank"] == 1
    assert got.loc[3, "rank"] == 2 and got.loc[6, "rank"] == 3  # tie: okey asc


def test_order_revenue_topk_empty(ray_session, tmp_path):
    import __ray_entry__ as e

    sf = _write_q3_fixture(tmp_path, [], [])
    out = _to_df(e.queries()["rel_order_revenue_topk"](sf))
    assert len(out) == 0


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_cross_bucket_prefix(ray_session, tmp_path):
    """doc_ids spanning multiple PACK_BUCKET ranges exercise the two-phase
    prefix sum: the bucket base offsets (driver cumsum) must chain exactly
    into the in-bucket cumsums, and pack boundaries must fall mid-doc-run."""
    from otelcol_con_spaneventtolog_ray.functions.corpus import (
        PACK_BUCKET, PACK_SEQ_LEN,
    )

    texts = {
        0: "a b c",                   # cb 0
        1: " ".join(["tok"] * 3000),  # cb 3
        PACK_BUCKET - 1: "x y",       # cb 3003 -> pack 1, offset 955
        PACK_BUCKET: "p q r s",       # bucket 1; cb 3005
        PACK_BUCKET + 7: "z",         # cb 3009
    }
    ids = sorted(texts)
    sf = _write_docs(tmp_path, [texts[i] for i in ids], ids=ids)
    _write_events_empty(tmp_path)
    got = _sql_parity(sf, "corpus_pack_sequences").set_index("doc_id")
    assert got.loc[0, ["pack_id", "pack_offset"]].tolist() == [0, 0]
    assert got.loc[1, ["pack_id", "pack_offset"]].tolist() == [0, 3]
    assert got.loc[PACK_BUCKET - 1, "pack_id"] == 3003 // PACK_SEQ_LEN
    assert got.loc[PACK_BUCKET - 1, "pack_offset"] == 3003 % PACK_SEQ_LEN
    # first doc of bucket 1 continues EXACTLY where bucket 0 ended
    assert got.loc[PACK_BUCKET, "pack_offset"] == 3005 % PACK_SEQ_LEN
    assert got.loc[PACK_BUCKET + 7, "pack_offset"] == 3009 % PACK_SEQ_LEN


# ---------------------------------------------------------------------------
# per-label embedding centroids
# ---------------------------------------------------------------------------

def _write_embeddings(tmp_path, vecs, labels):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_label_centroids_planted(ray_session, tmp_path):
    """Known means, including negative components (floor quantization is
    toward -inf on both engines — no tie-breaking rule to diverge)."""
    import __ray_entry__ as e

    sf = _write_embeddings(
        tmp_path,
        [[1.0, -1.0], [3.0, -2.0],     # label 0: mean (2.0, -1.5)
         [0.25, 0.75]],                # label 1
        [0, 0, 1],
    )
    got = _to_df(e.queries()["similarity_label_centroids"](sf))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'embeddings.parquet')}')"
    )
    exp = con.execute(e.oracle_sql()["similarity_label_centroids"]).df()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(exp), check_dtype=False, check_exact=True
    )
    g = got.set_index(["label", "dim"])
    assert g.loc[(0, 1), "mean"] == 2.0
    assert g.loc[(0, 2), "mean"] == -1.5
    assert g.loc[(1, 1), "mean"] == 0.25
    assert g.loc[(0, 1), "n"] == 2 and g.loc[(1, 2), "n"] == 1


def test_pack_and_centroids_survive_empty_input(ray_session, tmp_path):
    import __ray_entry__ as e

    _write_docs(tmp_path, [])
    _write_embeddings(tmp_path, [], [])
    assert len(_to_df(e.queries()["corpus_pack_sequences"](str(tmp_path)))) == 0
    assert len(
        _to_df(e.queries()["similarity_label_centroids"](str(tmp_path)))
    ) == 0


def test_nearest_centroid_planted(ray_session, tmp_path):
    """Vectors cluster around two planted prototypes; every vector must be
    assigned its own cluster's label, a centroid member at distance ~0."""
    import __ray_entry__ as e

    a, b = [10.0, 0.0], [0.0, 10.0]
    vecs = [a, [10.2, 0.1], [9.8, -0.1],        # label 3 cluster
            b, [0.1, 10.4]]                      # label 7 cluster
    sf = _write_embeddings(tmp_path, vecs, [3, 3, 3, 7, 7])
    got = _to_df(e.queries()["similarity_nearest_centroid"](sf))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'embeddings.parquet')}')"
    )
    exp = con.execute(e.oracle_sql()["similarity_nearest_centroid"]).df()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(exp), check_dtype=False, check_exact=True
    )
    g = got.set_index("vec_id")
    assert g.loc[[0, 1, 2], "label"].tolist() == [3, 3, 3]
    assert g.loc[[3, 4], "label"].tolist() == [7, 7]
    assert (g["dist2"] >= 0).all()


def test_nearest_centroid_empty(ray_session, tmp_path):
    import __ray_entry__ as e

    _write_embeddings(tmp_path, [], [])
    out = _to_df(e.queries()["similarity_nearest_centroid"](str(tmp_path)))
    assert len(out) == 0


def test_q3_sentinels_cover_every_ray_hash_partition():
    """Source pin: the sentinel keys must land one row in EVERY partition
    under Ray's OWN partitioner (transform_pyarrow.hash_partition). If a
    Ray upgrade changes the row-routing hash, this fails loudly here
    instead of resurfacing as the empty-partition join crash."""
    from ray.data._internal.arrow_ops.transform_pyarrow import hash_partition
    from otelcol_con_spaneventtolog_ray.functions.relational import (
        Q3_JOIN_PARTITIONS, _q3_join_sentinels,
    )

    sent = _q3_join_sentinels(Q3_JOIN_PARTITIONS)
    t = pa.table({"o_orderkey": pa.array(sent, pa.int64())})
    parts = hash_partition(
        t, hash_cols=["o_orderkey"], num_partitions=Q3_JOIN_PARTITIONS
    )
    covered = {p for p, tbl in parts.items() if tbl.num_rows > 0}
    assert covered == set(range(Q3_JOIN_PARTITIONS))


def test_user_lifetime_half_tie_and_pre_epoch(ray_session, tmp_path):
    """Round-4 review regressions: (a) a lifetime span that is an odd
    multiple of 43,200 us used to round half-even on the Ray side and
    half-away in DuckDB (now neither side rounds — one exact float64
    division); (b) pre-1970 timestamps used to day-bucket with numpy floor
    division vs DuckDB truncation-toward-zero (the mirror now floors)."""
    day = 86_400_000_000
    rows = [
        (1, 1000, 5, "view"),              # user 5: span exactly half a day
        (2, 1000 + day // 2, 5, "view"),
        (3, -1, 6, "view"),                # user 6: straddles the epoch
        (4, 1, 6, "view"),
    ]
    sf = _write_events(tmp_path, rows)
    _write_docs(tmp_path, ["x"])
    got = _sql_parity(sf, "events_user_lifetime").set_index("user_id")
    assert got.loc[5, "lifetime_days"] == 0.5
    # ts=-1us is day -1 under floor division; ts=+1us is day 0 -> 2 days
    assert got.loc[6, "active_days"] == 2


def test_hourly_anomalies_planted_spike(ray_session, tmp_path):
    """A flat hourly series with one spiked hour: only the spike trips the
    3-sigma flag, z is exactly reproduced by the DuckDB mirror, and a
    constant series (zero variance) yields z = 0 everywhere."""
    hour = 3_600_000_000
    rows, eid = [], 0
    for h in range(24):          # 'view': 5/hour, except hour 7 gets 100
        for _ in range(100 if h == 7 else 5):
            rows.append((eid, h * hour + eid % 60, 1, "view")); eid += 1
    for h in range(10):          # 'ping': constant 3/hour -> var 0, z 0
        for _ in range(3):
            rows.append((eid, h * hour + eid % 60, 2, "ping")); eid += 1
    sf = _write_events(tmp_path, rows)
    _write_docs(tmp_path, ["x"])
    got = _sql_parity(sf, "events_hourly_anomalies")
    view = got[got.event_type == "view"].set_index("hour_us")
    assert view.loc[7 * hour, "is_anomaly"] == 1
    assert view["is_anomaly"].sum() == 1           # only the spike
    ping = got[got.event_type == "ping"]
    assert (ping["z"] == 0.0).all() and (ping["is_anomaly"] == 0).all()


def test_type_transitions_planted(ray_session, tmp_path):
    """Transitions never cross user boundaries; probabilities are per-src;
    NULL event_type rows are excluded on both engines."""
    T = 1_700_000_000_000_000
    rows = [
        (1, T + 1, 1, "view"), (2, T + 2, 1, "click"),
        (3, T + 3, 1, "view"), (4, T + 4, 1, "click"),   # view->click x2
        (5, T + 5, 2, "click"), (6, T + 6, 2, "buy"),    # click->buy
        (7, T + 7, 3, "view"),                           # lone event: no pair
    ]
    sf = _write_events(tmp_path, rows)
    _write_docs(tmp_path, ["x"])
    got = _sql_parity(sf, "events_type_transitions").set_index(["src", "dst"])
    assert got.loc[("view", "click"), "n"] == 2
    assert got.loc[("view", "click"), "p"] == 1.0
    assert got.loc[("click", "view"), "n"] == 1   # within user 1 only
    assert got.loc[("click", "buy"), "n"] == 1
    assert got.loc[("click", "view"), "p"] == 0.5
    # user 2's buy never links to user 3's view (boundary respected)
    assert ("buy", "view") not in got.index


def test_type_transitions_null_type(ray_session, tmp_path):
    T = 1_700_000_000_000_000
    eid, ts, uid = [1, 2, 3], [T + 1, T + 2, T + 3], [1, 1, 1]
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["view", None, "click"], pa.string()),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    _write_docs(tmp_path, ["x"])
    got = _sql_parity(str(tmp_path), "events_type_transitions")
    # the NULL row is dropped BEFORE pairing: view->click becomes adjacent
    assert len(got) == 1
    assert got.iloc[0][["src", "dst"]].tolist() == ["view", "click"]


def test_centroid_confusion_planted(ray_session, tmp_path):
    """Two tight clusters with one mislabeled vector: exactly one
    off-diagonal cell."""
    import __ray_entry__ as e

    vecs = [[10.0, 0.0], [10.1, 0.2], [9.9, -0.1],
            [0.0, 10.0], [0.2, 9.8],
            [10.05, 0.05]]          # sits in cluster 3 but labeled 7
    sf = _write_embeddings(tmp_path, vecs, [3, 3, 3, 7, 7, 7])
    got = _to_df(e.queries()["similarity_centroid_confusion"](sf))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'embeddings.parquet')}')"
    )
    exp = con.execute(e.oracle_sql()["similarity_centroid_confusion"]).df()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(exp), check_dtype=False, check_exact=True
    )
    g = got.set_index(["true_label", "assigned_label"])["n"]
    assert g.loc[(3, 3)] == 3
    assert g.loc[(7, 3)] == 1    # the mislabeled vector
    assert g.loc[(7, 7)] == 2
    assert (3, 7) not in g.index


def test_dedup_group_stats_planted_clusters(ray_session, tmp_path):
    """3 singletons + one pair + one triple -> histogram rows (1,3,3),
    (2,1,2), (3,1,3)."""
    sf = _write_docs(
        tmp_path,
        ["a", "b", "c", "dup two", "dup two", "dup three", "dup three",
         "dup three"],
    )
    _write_events_empty(tmp_path)
    got = _sql_parity(sf, "dedup_group_stats").set_index("group_size")
    assert got.loc[1, ["n_groups", "n_docs"]].tolist() == [3, 3]
    assert got.loc[2, ["n_groups", "n_docs"]].tolist() == [1, 2]
    assert got.loc[3, ["n_groups", "n_docs"]].tolist() == [1, 3]


def test_dup_rate_by_source_planted(ray_session, tmp_path):
    """Source A: 4 docs, 2 distinct -> rate 0.5; source B: all unique.
    A text shared ACROSS sources counts as distinct within each."""
    texts = ["x", "x", "y", "y",            # A: 2 distinct of 4
             "p", "q", "x"]                 # B: 3 distinct of 3 ('x' too)
    sources = ["A"] * 4 + ["B"] * 3
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    _write_events_empty(tmp_path)
    got = _sql_parity(str(tmp_path), "dedup_dup_rate_by_source").set_index(
        "source"
    )
    assert got.loc["A", ["n_docs", "n_distinct"]].tolist() == [4, 2]
    assert got.loc["A", "dup_rate"] == 0.5
    assert got.loc["B", ["n_docs", "n_distinct"]].tolist() == [3, 3]
    assert got.loc["B", "dup_rate"] == 0.0


def test_dedup_profiling_null_text_and_source(ray_session, tmp_path):
    """Second-review regressions: NULL text merges with '' on BOTH engines
    (the content hash already treats them identically; the mirrors now
    group by coalesce(text, '')), and a NULL source is its own group on
    BOTH engines (pandas dropna=False; SQL GROUP BY keeps NULLs)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([None, "", "x", "x"], pa.string()),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["A", "A", None, None], pa.string()),
            "n_chars": pa.array([0, 0, 1, 1], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    _write_events_empty(tmp_path)
    stats = _sql_parity(str(tmp_path), "dedup_group_stats").set_index(
        "group_size"
    )
    # NULL + '' merge into one size-2 group; the two 'x' docs another
    assert stats.loc[2, "n_groups"] == 2 and len(stats) == 1
    rate = _to_df(
        __import__("__ray_entry__").queries()["dedup_dup_rate_by_source"](
            str(tmp_path)
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
    )
    exp = con.execute(
        __import__("__ray_entry__").oracle_sql()["dedup_dup_rate_by_source"]
    ).df()
    pd.testing.assert_frame_equal(
        _canon(rate), _canon(exp), check_dtype=False, check_exact=True
    )
    assert len(rate) == 2  # 'A' and the NULL-source group


def test_hourly_anomalies_null_type_dropped(ray_session, tmp_path):
    """NULL event_type rows are excluded identically on both engines."""
    hour = 3_600_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([10, hour + 10, 2 * hour + 10],
                           pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["view", None, "view"], pa.string()),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    _write_docs(tmp_path, ["x"])
    got = _sql_parity(str(tmp_path), "events_hourly_anomalies")
    assert set(got["event_type"]) == {"view"} and len(got) == 2


# ---------------------------------------------------------------------------
# cross-source n-gram overlap matrix
# ---------------------------------------------------------------------------


def _write_docs_sources(tmp_path, rows):
    """rows: list of (doc_id, text, source) — source/text may be None."""
    ids, texts, srcs = zip(*rows)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_source_overlap_planted_grams(ray_session, tmp_path):
    """Planted trigram sharing: A={'a b c','b c d'}, B={'b c d','c d e'},
    C={'x y z'} -> only (A,B) appears, with n_common=1 and jaccard=1/3.
    NULL text and NULL source rows must not contribute."""
    sf = _write_docs_sources(
        tmp_path,
        [
            (0, "a b c d", "srcA"),
            (1, "b c d e", "srcB"),
            (2, "x y z", "srcC"),
            (3, None, "srcA"),
            (4, "b c d", None),
        ],
    )
    got = _sql_parity(sf, "corpus_source_overlap")
    rows = got.to_dict("records")
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("srcA", "srcB")
    assert (r["n_common"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert r["jaccard"] == round(1 / 3, 6)


def test_source_overlap_short_doc_single_gram(ray_session, tmp_path):
    """Docs shorter than K collapse to ONE gram over all words (the
    batch_shingles convention): two 2-word copies across sources share
    exactly that gram."""
    sf = _write_docs_sources(
        tmp_path, [(0, "p q", "s1"), (1, "p q", "s2")]
    )
    got = _sql_parity(sf, "corpus_source_overlap")
    r = got.to_dict("records")[0]
    assert (r["n_common"], r["n_a"], r["n_b"]) == (1, 1, 1)
    assert r["jaccard"] == 1.0


def test_source_overlap_source_cap_fail_fast(ray_session, tmp_path,
                                             monkeypatch):
    from otelcol_con_spaneventtolog_ray.functions import decontam

    monkeypatch.setattr(decontam, "SOURCE_OVERLAP_MAX_SOURCES", 2)
    sf = _write_docs_sources(
        tmp_path,
        [(0, "a b c", "s1"), (1, "a b c", "s2"), (2, "a b c", "s3")],
    )
    with pytest.raises(ValueError, match="at most 2 sources"):
        decontam.q_source_overlap(sf)


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets
# ---------------------------------------------------------------------------


def _ppl_bruteforce(texts, ids):
    """Scalar mirror of the lm_micro metric + nearest-rank tertiles."""
    import collections
    import math

    toks_per_doc = {
        i: [w for w in (t or "").split() if w] for i, t in zip(ids, texts)
    }
    counts = collections.Counter(
        w for ws in toks_per_doc.values() for w in ws
    )
    total = sum(counts.values())
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    )

    def m(tok):
        n = vocab.get(tok, 0.5)
        # np.rint banker's rounding on the same float product
        return int(np.rint(-math.log(n / total) * 1e6))

    micro = {
        i: sum(m(w) for w in ws) // len(ws)
        for i, ws in toks_per_doc.items()
        if ws
    }
    vals = sorted(micro.values())
    n = len(vals)
    t33 = vals[((n - 1) * 33) // 100]
    t66 = vals[((n - 1) * 66) // 100]
    return {
        i: (v, "head" if v <= t33 else ("middle" if v <= t66 else "tail"))
        for i, v in micro.items()
    }


def test_perplexity_buckets_match_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    words = "the quick brown fox jumps over lazy dog rare unseen".split()
    # skewed frequencies so docs differ in mean NLL
    probs = np.array([20, 15, 10, 8, 6, 5, 4, 3, 2, 1], dtype=float)
    probs /= probs.sum()
    ids = list(range(60))
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(5, 40)), p=probs))
        for _ in ids
    ]
    ids += [100, 101]
    texts += ["", "rare unseen rare unseen"]  # token-less + OOV-free tail
    sf = _write_docs(tmp_path, texts, ids)
    got = _sql_parity(sf, "text_perplexity_buckets")
    exp = _ppl_bruteforce(texts, ids)
    assert len(got) == len(exp)  # doc 100 (no tokens) absent
    for r in got.to_dict("records"):
        v, b = exp[r["doc_id"]]
        assert r["lm_micro"] == v, r
        assert r["ppl_bucket"] == b, r
    # every bucket is populated and identical texts share a bucket
    assert set(got["ppl_bucket"]) == {"head", "middle", "tail"}


def test_perplexity_buckets_ties_share_bucket(ray_session, tmp_path):
    """Identical texts have identical lm_micro and MUST land in one
    bucket regardless of where the tertile rank falls inside the tie."""
    texts = ["same same same"] * 9 + ["zq zq zq zq"]
    sf = _write_docs(tmp_path, texts, list(range(10)))
    got = _sql_parity(sf, "text_perplexity_buckets")
    same = got[got["doc_id"] < 9]["ppl_bucket"].unique()
    assert len(same) == 1


# ---------------------------------------------------------------------------
# token-budget corpus selection
# ---------------------------------------------------------------------------


def test_token_budget_boundary_tie_class_kept(ray_session, tmp_path):
    """Four docs at three quality levels; the budget lands inside the
    middle tie class -> the WHOLE tie class is kept (inclusive boundary),
    the lower level dropped. Brute-force mirror computed inline."""
    # quality is monotone in ws_tokens below 100 words: more words ->
    # higher quality component. Build three distinct word counts.
    texts = [
        " ".join(["w"] * 90),   # high quality
        " ".join(["w"] * 50),   # mid
        " ".join(["w"] * 50),   # mid (tie class)
        " ".join(["w"] * 10),   # low
    ]
    sf = _write_docs(tmp_path, texts, [0, 1, 2, 3])
    got = _sql_parity(sf, "corpus_token_budget").set_index("doc_id")
    # budget = total_bpe_tokens // 2; the high doc alone is under budget,
    # adding the mid tie class crosses it -> high + both mids kept
    assert bool(got.loc[0, "kept"])
    assert bool(got.loc[1, "kept"]) and bool(got.loc[2, "kept"])
    assert not bool(got.loc[3, "kept"])
    # kept token mass reaches the budget, and dropping the boundary tie
    # class would fall below it (the defining property of the threshold)
    tok = got["bpe_tokens"]
    budget = int(tok.sum()) // 2
    kept_mass = int(tok[got["kept"]].sum())
    assert kept_mass >= budget
    assert int(tok.loc[[0]].sum()) < budget


def test_token_budget_null_text_counts_as_empty(ray_session, tmp_path):
    """A NULL-text doc counts as '' (the repo-wide NULL≡'' convention,
    adopted here after the parity fuzz replaced the earlier drop-NULL
    contract): present on BOTH engines with 0 tokens, and it must not
    corrupt the integer distribution (the NaN -> astype(int64) hazard)."""
    sf = _write_docs_sources(
        tmp_path,
        [(0, " ".join(["w"] * 80), "s"), (1, None, "s"),
         (2, " ".join(["w"] * 20), "s"), (3, " ".join(["w"] * 40), "s"),
         (4, " ".join(["w"] * 60), "s")],
    )
    got = _sql_parity(sf, "corpus_token_budget")
    assert sorted(got["doc_id"]) == [0, 1, 2, 3, 4]
    assert int(got.set_index("doc_id").loc[1, "bpe_tokens"]) == 0


def test_token_budget_single_tie_class_keeps_all(ray_session, tmp_path):
    """All docs share one quality level: the boundary tie class IS the
    corpus, so everything is kept (inclusive-boundary rule)."""
    texts = [" ".join(["w"] * 30)] * 6
    sf = _write_docs(tmp_path, texts, list(range(6)))
    got = _sql_parity(sf, "corpus_token_budget")
    assert got["kept"].all()


def test_temperature_mixture_planted_skew(ray_session, tmp_path):
    """Two sources with 8:1 token mass: shares are 8/9 and 1/9; the
    temperature weight (alpha=0.3) compresses the gap, so the small source
    is BOOSTED (boost > 1) and the big one damped (boost < 1); weights sum
    to 1. A zero-token (NULL-text) source is excluded on both engines."""
    sf = _write_docs_sources(
        tmp_path,
        [(0, " ".join(["w"] * 8), "big"), (1, "w", "small"),
         (2, None, "empty")],
    )
    got = _sql_parity(sf, "corpus_temperature_mixture").set_index("source")
    assert sorted(got.index) == ["big", "small"]
    assert abs(got["weight"].sum() - 1.0) < 1e-5
    big, small = got.loc["big"], got.loc["small"]
    assert abs(big["share"] - 8 / 9) < 1e-6
    assert small["boost"] > 1.0 > big["boost"]
    # exact alpha semantics: w ∝ share^0.3
    import math
    wb = (8 / 9) ** 0.3
    ws = (1 / 9) ** 0.3
    assert abs(big["weight"] - wb / (wb + ws)) < 1e-5
    assert abs(small["weight"] - ws / (wb + ws)) < 1e-5


def test_temperature_mixture_uniform_is_identity(ray_session, tmp_path):
    """Equal-mass sources: temperature scaling is a no-op — every weight
    equals its share and every boost is exactly 1."""
    sf = _write_docs_sources(
        tmp_path,
        [(i, " ".join(["w"] * 10), f"s{i % 4}") for i in range(8)],
    )
    got = _sql_parity(sf, "corpus_temperature_mixture")
    assert len(got) == 4
    assert (got["boost"] == 1.0).all()
    assert np.allclose(got["weight"], got["share"])


def test_bm25_planted_semantics(ray_session, tmp_path):
    """Hand-checkable BM25: the doc holding the RARE query term ('vector',
    df=1) outranks docs with only the common term ('hash', df=3); a doc
    with no query term is absent; shorter docs rank above longer ones at
    equal tf (the length normalization). Exact parity with the SQL mirror."""
    texts = [
        "hash filler filler filler filler filler",  # common term, long
        "hash",                                     # common term, short
        "vector hash",                              # rare + common
        "filler only no terms",                     # excluded
    ]
    sf = _write_docs(tmp_path, texts, [0, 1, 2, 3])
    got = _sql_parity(sf, "text_bm25_topk")
    got = got.sort_values("rank").reset_index(drop=True)  # canon sorted rows
    assert list(got["doc_id"]) != []
    assert 3 not in set(got["doc_id"])
    byid = got.set_index("doc_id")
    # rare-term doc wins outright
    assert got.iloc[0]["doc_id"] == 2
    # same tf of 'hash': the short doc (1) scores above the long doc (0)
    assert byid.loc[1, "score"] > byid.loc[0, "score"]
    # ranks are 1..n in score order
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_new_users_daily_planted(ray_session, tmp_path):
    """Staggered arrivals: u1 day0, u2 day0, u3 day2 (after earlier noise
    events from u1/u2 — re-appearances must NOT recount), cum_users is the
    running total and ends at the distinct-user count."""
    day = 86_400_000_000
    rows = [
        (1, 10, 100, "view"),          # u100 day0
        (2, 20, 101, "view"),          # u101 day0
        (3, day + 5, 100, "click"),    # u100 again day1 -> not new
        (4, 2 * day + 7, 102, "view"), # u102 day2
        (5, 2 * day + 9, 101, "buy"),  # u101 again day2 -> not new
    ]
    sf = _write_events(tmp_path, [(e, pd.Timestamp(t, unit="us"), u, ty)
                                  for e, t, u, ty in rows])
    got = _sql_parity(sf, "events_new_users_daily")
    got = got.sort_values("day_us").reset_index(drop=True)
    assert list(got["new_users"]) == [2, 1]
    assert list(got["cum_users"]) == [2, 3]
    assert list(got["day_us"]) == [0, 2 * day]


def test_unigram_entropy_planted(ray_session, tmp_path):
    """Hand-checkable entropies: uniform 4-token doc = ln(4), constant doc
    = 0, 50/50 doc = ln(2); NULL-text doc absent. Exact SQL parity."""
    import math

    sf = _write_docs_sources(
        tmp_path,
        [(0, "a b c d", "s"), (1, "x x x x", "s"), (2, "y y z z", "s"),
         (3, None, "s")],
    )
    got = _sql_parity(sf, "text_unigram_entropy").set_index("doc_id")
    assert sorted(got.index) == [0, 1, 2]
    assert abs(got.loc[0, "entropy"] - round(math.log(4), 6)) < 1e-9
    assert got.loc[1, "entropy"] == 0.0
    assert abs(got.loc[2, "entropy"] - round(math.log(2), 6)) < 1e-9
    assert list(got["n_tokens"]) == [4, 4, 4]


def test_power_users_pareto_planted(ray_session, tmp_path):
    """10 users: one with 91 events, nine with 1 each. K = ceil(10%... with
    PARETO_PCT=1, ceil(10*1/100) = 1 -> cutoff = 91, top 1 user holds 91%
    of events. Tie inclusivity: duplicate the heavy count and BOTH heavy
    users must be included even though K=1."""
    day_us = 1_000_000
    rows = []
    eid = 0
    for u in range(10):
        n = 91 if u == 0 else 1
        for i in range(n):
            rows.append((eid, eid * day_us, u, "e"))
            eid += 1
    sf = _write_events(tmp_path, [(e, pd.Timestamp(t, unit="us"), u, ty)
                                  for e, t, u, ty in rows])
    got = _sql_parity(sf, "events_power_users_pareto")
    row = got.iloc[0]
    assert row["n_users"] == 10 and row["n_events"] == 100
    assert row["k_target"] == 1 and row["cutoff"] == 91
    assert row["top_users"] == 1 and row["top_events"] == 91
    assert row["top_share"] == 0.91

    # tie at the cutoff: two users at 91 -> inclusive rule takes both
    rows2 = list(rows)
    for i in range(90):
        rows2.append((eid, eid * day_us, 1, "e"))
        eid += 1
    sf2 = _write_events(tmp_path, [(e, pd.Timestamp(t, unit="us"), u, ty)
                                   for e, t, u, ty in rows2])
    got2 = _sql_parity(sf2, "events_power_users_pareto")
    row2 = got2.iloc[0]
    assert row2["k_target"] == 1 and row2["cutoff"] == 91
    assert row2["top_users"] == 2 and row2["top_events"] == 182


def test_js_divergence_planted(ray_session, tmp_path):
    """Hand-checkable JSD: sources A='x x x x', B='y y y y' -> corpus is
    50/50, each source diverges by 0.5*ln(4/3) + 0.25*ln(1/3... computed:
    0.215762 nats (symmetric). A single-source corpus has JSD exactly 0."""
    import math

    sf = _write_docs_sources(
        tmp_path, [(0, "x x x x", "A"), (1, "y y y y", "B")]
    )
    got = _sql_parity(sf, "text_js_divergence_by_source").set_index("source")
    p, q = 1.0, 0.5
    exp = 0.5 * (p * math.log(p / 0.75)) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    )
    assert abs(got.loc["A", "jsd"] - round(exp, 6)) < 1e-9
    assert abs(got.loc["B", "jsd"] - round(exp, 6)) < 1e-9
    assert got.loc["A", "n_tokens"] == 4

    sf2 = _write_docs_sources(tmp_path, [(0, "x y x y", "only")])
    got2 = _sql_parity(sf2, "text_js_divergence_by_source")
    assert list(got2["jsd"]) == [0.0]
