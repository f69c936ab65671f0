"""Property-based parity: the vectorized text-hash kernels against their
scalar mirrors over randomized unicode documents and batch compositions.
The batch kernels read raw Arrow buffers (offsets, slices, doc boundaries),
so the risky surface is exactly batch composition — empty docs, whitespace
runs at edges, multi-byte UTF-8, sliced/offset arrays."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from otelcol_con_spaneventtolog_ray.functions.dedup import (
    _band_buckets,
    _doc_shingles,
    _minhash_sigs,
    band_keys,
    minhash_signature,
    simhash64,
    simhash_batch,
    word_shingles,
)
from otelcol_con_spaneventtolog_ray.functions.texthash import (
    batch_words,
    word_hash_scalar,
    words_scalar,
)

# documents: whitespace-heavy alphabet incl. multi-byte chars and ALL the
# ASCII ws class members, plus unicode spaces that must NOT split
_ALPHABET = "ab Ωé\t\n\r\x0b\x0c \xa0 xyz0;=%"
_DOC = st.text(alphabet=_ALPHABET, max_size=60)


@settings(max_examples=60, deadline=None)
@given(st.lists(_DOC, min_size=0, max_size=12), st.integers(0, 5))
def test_batch_kernels_match_scalar_mirrors(texts, offset):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    # exercise non-zero array offsets too: slice off the first `offset` rows
    offset = min(offset, len(texts))
    tbl = tbl.slice(offset)
    texts = texts[offset:]

    wh, _par, offs = batch_words(tbl.column("text"))
    for d, t in enumerate(texts):
        exp = np.array(
            [word_hash_scalar(w) for w in words_scalar(t)], dtype=np.uint64
        )
        assert np.array_equal(wh[offs[d]:offs[d + 1]], exp), repr(t)

    sh, soffs, n = _doc_shingles(tbl)
    sigs = _minhash_sigs(sh, soffs, n)
    bb = _band_buckets(sigs)
    sims = simhash_batch(tbl).column("simhash").to_pylist()
    for d, t in enumerate(texts):
        shingles = word_shingles(t)
        got = set(
            int(x) & ((1 << 64) - 1) for x in sh[soffs[d]:soffs[d + 1]].tolist()
        )
        assert got == shingles, repr(t)
        assert np.array_equal(sigs[d], minhash_signature(shingles)), repr(t)
        exp_bands = [
            k - (1 << 64) if k >= (1 << 63) else k
            for k in band_keys(minhash_signature(shingles))
        ]
        assert bb[d].tolist() == exp_bands, repr(t)
        assert sims[d] & ((1 << 64) - 1) == simhash64(t), repr(t)


@settings(max_examples=30, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=10), st.integers(1, 5))
def test_shingles_independent_of_batch_split(texts, cut):
    """Splitting a batch at any point yields the same per-doc shingle sets
    as one combined batch (no cross-document state)."""
    cut = min(cut, len(texts))

    def shingle_sets(ts):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(ts)), pa.int64()),
                "text": pa.array(ts, pa.string()),
            }
        )
        sh, offs, n = _doc_shingles(tbl)
        return [set(sh[offs[d]:offs[d + 1]].tolist()) for d in range(n)]

    whole = shingle_sets(texts)
    parts = shingle_sets(texts[:cut]) + shingle_sets(texts[cut:])
    assert whole == parts


@settings(max_examples=60, deadline=None)
@given(st.lists(_DOC, min_size=0, max_size=12), st.integers(0, 5))
def test_content_hash_matches_scalar_mirror(texts, offset):
    from otelcol_con_spaneventtolog_ray.functions.texthash import (
        batch_content_hash,
        content_hash_scalar,
    )

    offset = min(offset, len(texts))
    col = pa.array(texts, pa.string()).slice(offset)
    texts = texts[offset:]
    h1, h2 = batch_content_hash(col)
    for d, t in enumerate(texts):
        assert (int(h1[d]), int(h2[d])) == content_hash_scalar(t), repr(t)


def test_content_hash_leading_nul_is_not_an_alias():
    """The leading-1 sentinel: '\\x00a' must not hash like 'a' (a plain
    polynomial fold would alias them, since the NUL contributes 0*B), and
    empty vs single-NUL strings must differ too."""
    from otelcol_con_spaneventtolog_ray.functions.texthash import (
        batch_content_hash,
        content_hash_scalar,
    )

    col = pa.array(["a", "\x00a", "", "\x00", "\x00\x00"], pa.string())
    h1, h2 = batch_content_hash(col)
    pairs = list(zip(h1.tolist(), h2.tolist()))
    assert len(set(pairs)) == len(pairs)
    assert content_hash_scalar("a") != content_hash_scalar("\x00a")


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 6),                 # user
            st.integers(0, 4_000_000_000),     # ts offset (crosses the gap)
            st.sampled_from(["error", "click", "view"]),
        ),
        min_size=0, max_size=60,
    )
)
def test_eventops_block_folds_property_parity(rows):
    """Hypothesis sweep: the segment-vectorized event-window folds equal
    the per-group pandas references on arbitrary tiny compositions —
    duplicate timestamps, empty blocks, singleton users, errors at ties."""
    import pandas as pd

    from otelcol_con_spaneventtolog_ray.functions.eventops import (
        asof_last_error_block,
        asof_last_error_group,
        range_join_block,
        range_join_group,
        sessionize_block,
        sessionize_group,
    )

    base = np.int64(1_700_000_000_000_000)
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array(
            np.array([base + r[1] for r in rows], dtype=np.int64),
            pa.timestamp("us"),
        ),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    df = t.to_pandas()

    def ref(groupfn, cols):
        if len(df) == 0:
            return None
        return pd.concat(
            [groupfn(g) for _, g in df[cols].groupby("user_id")],
            ignore_index=True,
        )

    def cmp(got, exp, keys):
        got = got.to_pandas()
        if exp is None:
            assert len(got) == 0
            return
        got = got.sort_values(keys).reset_index(drop=True)
        exp = exp.sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)],
            check_dtype=False,
        )

    cmp(sessionize_block(t),
        ref(sessionize_group, ["event_id", "ts", "user_id"]),
        ["user_id", "session_id"])
    cmp(asof_last_error_block(t),
        ref(asof_last_error_group,
            ["event_id", "ts", "user_id", "event_type"]),
        ["event_id"])
    cmp(range_join_block(t),
        ref(range_join_group, ["event_id", "ts", "user_id"]),
        ["event_id"])
