"""Randomized cross-engine parity fuzz for the final-session SQL-gated ops.

The driver regenerates testdata between rounds, so the real risk to a
hash gate is a text shape the fixed corpora never exercised. Each case
here builds an adversarial documents table (NULL text, empty strings,
single words, tabs/newlines/multi-space runs, unicode, benchmark-id
collisions) from FIXED seeds (deterministic — no flaky CI) and asserts
the Ray result equals the DuckDB oracle exactly, the same compare the
driver runs."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_entry_queries import _canon, _to_df

WORDS = ["alpha", "beta", "gamma", "délta", "eps", "zeta", "Ω", "x", "-",
         "7", "the", "of", "and"]
WS = [" ", "  ", "\t", "\n", " \t "]


def _rand_text(rng) -> str | None:
    r = rng.random()
    if r < 0.08:
        return None
    if r < 0.16:
        return ""
    if r < 0.24:
        return rng.choice(WORDS)  # single word: no bigrams/shingles
    n = int(rng.integers(2, 40))
    parts = []
    for k in range(n):
        parts.append(str(rng.choice(WORDS)))
        if k < n - 1:
            parts.append(str(rng.choice(WS)))
    return "".join(parts)


def _fuzz_corpus(tmp_path, seed: int) -> str:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 120))
    texts = [_rand_text(rng) for _ in range(n)]
    # plant a few benchmark near-copies so fuzzy decontam has positives
    for i in range(0, n - 11, max(10, n // 4)):
        if texts[i] and len(texts[i].split()) >= 6:
            texts[i + 11] = texts[i].replace(texts[i].split()[0], "omega", 1)
    tbl = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
    })
    d = tmp_path / f"fuzz{seed}"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


#: gated ops whose only input is the documents table — every other family
#: (events_/rel_/pipeline_/similarity_/multimodal_) reads tables the fuzz
#: corpus does not synthesize; the three exceptions below are
#: documents-prefixed names that still need embeddings/events
_NON_DOC_PREFIXES = ("events_", "rel_", "pipeline_", "similarity_",
                     "multimodal_")
_NON_DOC_NAMES = {"dedup_embedding_neardup", "dedup_semantic_keep",
                  "sketch_value_quantiles",
                  # round-5 upgrades over non-document tables (the fuzz
                  # corpus writes documents.parquet only)
                  "dedup_embedding_neardup_lsh", "sketch_bloom_users"}


def _doc_only_gated_ops():
    import __ray_entry__ as e

    return sorted(
        n for n in e.oracle_sql()
        if not n.startswith(_NON_DOC_PREFIXES) and n not in _NON_DOC_NAMES
    )


@pytest.mark.parametrize("seed", [3, 17, 59])
def test_doc_ops_parity_on_adversarial_corpora(ray_session, tmp_path, seed):
    """Every documents-only SQL-gated op (50+) against the DuckDB oracle on
    the adversarial corpus. This sweep caught, in one round: the fuzzy-
    decontam sub-k-doc gap, NULL-text crashes in jaccard/line/fingerprint
    kernels, int64-garbage stats for NULL docs, DuckDB least() yielding a
    phantom 0.7 quality for NULL text, and the dedup_exact mirror missing
    the NULL≡'' content-hash convention."""
    import __ray_entry__ as e

    sf = _fuzz_corpus(tmp_path, seed)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}')"
    )
    qs, sqls = e.queries(), e.oracle_sql()
    failures = []
    for name in _doc_only_gated_ops():
        try:
            got = _canon(_to_df(qs[name](sf)))
            exp = _canon(con.execute(sqls[name]).df())
            assert len(got) == len(exp), f"rows {len(got)} != {len(exp)}"
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True,
            )
        except Exception as ex:  # collect all, report together
            failures.append(f"{name}: {str(ex)[:200]}")
    assert not failures, f"seed {seed}:\n" + "\n".join(failures)


# ---------------------------------------------------------------------------
# events-table fuzz: NULL user/type/value/props, pre-1970 and far-future
# timestamps (the floor-division hazard), unicode event types, duplicate
# event_ids — against every events-only SQL-gated op.
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "view", "signup", "purchase", "error", "Ωmega",
               "chase", "upload", None]


def _fuzz_events(tmp_path, seed: int) -> str:
    import datetime

    rng = np.random.default_rng(seed)
    n = int(rng.integers(150, 400))
    base = datetime.datetime(2024, 1, 1)
    ts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.05:  # pre-1970: negative epoch, the floor-div hazard
            ts.append(datetime.datetime(1969, 12, 25)
                      + datetime.timedelta(seconds=int(rng.integers(0, 9e5))))
        elif r < 0.1:  # far future
            ts.append(datetime.datetime(2085, 6, 1)
                      + datetime.timedelta(seconds=int(rng.integers(0, 9e5))))
        else:
            ts.append(base + datetime.timedelta(
                seconds=int(rng.integers(0, 60 * 86400))))
    users = [None if rng.random() < 0.06 else int(rng.integers(0, 25))
             for _ in range(n)]
    vals = [None if rng.random() < 0.08
            else round(float(rng.normal(100, 60)), 2) for _ in range(n)]
    props = [None if rng.random() < 0.1 else '{"k": %d}' % rng.integers(0, 9)
             for _ in range(n)]
    types = [EVENT_TYPES[int(rng.integers(0, len(EVENT_TYPES)))]
             for _ in range(n)]
    ids = list(range(n))
    ids[-1] = 0 if n > 1 else 0  # one duplicate event_id
    tbl = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    })
    d = tmp_path / f"evfuzz{seed}"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def _events_only_gated_ops():
    import __ray_entry__ as e

    return sorted(
        n for n in e.oracle_sql()
        if n.startswith("events_") and n != "events_distinct_users_exact"
        or n == "sketch_value_quantiles"
    )


@pytest.mark.parametrize("seed", [5, 23])
def test_events_ops_parity_on_adversarial_tables(ray_session, tmp_path, seed):
    """Every events-only SQL-gated op against the DuckDB oracle on an
    adversarial events table (NULL user/type/value/props, pre-1970 and
    far-future timestamps, unicode types, a duplicate event_id)."""
    import __ray_entry__ as e

    sf = _fuzz_events(tmp_path, seed)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'events.parquet')}')"
    )
    qs, sqls = e.queries(), e.oracle_sql()
    failures = []
    for name in _events_only_gated_ops():
        try:
            got = _canon(_to_df(qs[name](sf)))
            exp = _canon(con.execute(sqls[name]).df())
            assert len(got) == len(exp), f"rows {len(got)} != {len(exp)}"
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True,
            )
        except Exception as ex:
            failures.append(f"{name}: {str(ex)[:200]}")
    assert not failures, f"seed {seed}:\n" + "\n".join(failures)
