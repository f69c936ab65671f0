"""Text-analysis operators for large-scale training-data pipelines.

All vectorized ``map_batches`` transforms over the ``documents`` table:

* token counting — whitespace tokens AND a BPE-ish regex tokenizer
* quality scoring — length / punctuation / stopword ratios, fixed formula
* language ID — marker-substring n-gram heuristic (deterministic argmax)
* document fingerprinting — md5 over whitespace-normalized lowercased text

Every op keeps an exact DuckDB SQL mirror (registered in entry_queries) so
the driver's value-hash gate covers it. Scores are rounded to 6 dp so float
noise can't flip the compare.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from ..rayenv import remote_kwargs

# BPE-ish token classes: letter runs, digit runs, single other-symbols
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: marker substrings per language (counted with spaces to match whole words)
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " et ", " la "]),
    ("es", [" el ", " y ", " los "]),
]

PUNCT_CHARS = ".,;:!?"
STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def _count_sub(col: pa.ChunkedArray | pa.Array, sub: str) -> np.ndarray:
    return pc.count_substring(col, pattern=sub).to_numpy(zero_copy_only=False).astype(
        np.int64
    )


def ws_token_counts(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Null-safe ws_tokens (the repo's pinned single-space convention:
    space count + 1). NULL text yields 0 — the aggregate mirrors' sum()
    skips NULL rows — instead of the INT64_MIN that a bare
    NaN->astype(int64) produces. Shared by corpus_report and
    corpus_source_mixture so the convention has one definition."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    null = pc.is_null(text).to_numpy(zero_copy_only=False).astype(bool)
    sub = pc.count_substring(text, pattern=" ").to_numpy(zero_copy_only=False)
    out = np.where(
        null, 0.0, np.nan_to_num(sub.astype(np.float64)) + 1.0
    )
    return out.astype(np.int64)


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> per-doc token counts + quality score.

    NULL text counts as '' (the repo-wide NULL≡'' content convention; the
    SQL mirror coalesces identically) — without the fill, every Arrow
    count kernel returns null and the int64 casts turn it into garbage
    sentinels (parity-fuzz regression)."""
    text = pc.fill_null(batch.column("text"), "")
    doc_id = batch.column("doc_id")
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    ws_tokens = _count_sub(text, " ") + 1  # single-space word salads
    bpe_tokens = (
        pc.count_substring_regex(text, pattern=TOKEN_REGEX)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    punct = np.zeros(len(batch), dtype=np.int64)
    for ch in PUNCT_CHARS:
        punct += _count_sub(text, ch)
    stop_hits = np.zeros(len(batch), dtype=np.int64)
    for w in STOPWORDS:
        stop_hits += _count_sub(text, f" {w} ")
    punct_ratio = np.where(n_chars > 0, punct / n_chars, 0.0)
    stop_ratio = np.where(ws_tokens > 0, stop_hits / ws_tokens, 0.0)
    quality = np.round(
        0.4 * np.minimum(1.0, ws_tokens / 100.0)
        + 0.3 * np.minimum(1.0, 10.0 * stop_ratio)
        + 0.3 * (1.0 - np.minimum(1.0, 10.0 * punct_ratio)),
        6,
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "n_chars": pa.array(n_chars, pa.int64()),
            "ws_tokens": pa.array(ws_tokens, pa.int64()),
            "bpe_tokens": pa.array(bpe_tokens, pa.int64()),
            "quality": pa.array(np.round(quality, 6), pa.float64()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-substring language ID; argmax with first-listed-language ties.

    utf8_lower (not ascii_lower) so the lowering matches the DuckDB mirror's
    Unicode ``lower()`` on non-ASCII documents. NULL text counts as ''
    (mirror coalesces identically; un-filled nulls turn the int casts into
    garbage sentinels — parity-fuzz regression)."""
    text = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
    n = batch.num_rows
    scores = np.zeros((len(LANG_MARKERS), n), dtype=np.int64)
    for li, (_lang, markers) in enumerate(LANG_MARKERS):
        for m in markers:
            scores[li] += _count_sub(text, m)
    best = np.argmax(scores, axis=0)  # first max wins (list order = priority)
    langs = np.array([l for l, _ in LANG_MARKERS], dtype=object)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(langs[best], pa.string()),
            "en_hits": pa.array(scores[0], pa.int64()),
        }
    )


# ASCII whitespace class [\t\n\v\f\r ] — Python re.ASCII '\s'. The DuckDB
# mirrors and the Arrow kernels run RE2, whose '\s' is ALSO ASCII-only but
# EXCLUDES \v (\x0b); since round 5 every RE2 pattern (SQL mirrors and
# pyarrow split/replace kernels) therefore spells the class out explicitly
# as [ \t\n\r\x0b\x0c]+ so all three surfaces agree byte-for-byte, and
# neither matches Unicode spaces (\xa0, U+2028, ...).
_WS_RE = re.compile(r"\s+", re.ASCII)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """md5 fingerprint over lower(whitespace-normalized text).

    Lowering goes through Arrow's utf8_lower (simple per-rune mapping) so
    non-ASCII documents ('İ' -> 'i', not 'i'+combining-dot as Python's
    full-mapping str.lower() would give) hash identically to the DuckDB
    mirror's lower().

    md5 is retained DELIBERATELY: the fingerprint string IS this op's
    output contract and the DuckDB mirror must reproduce it with its own
    md5() — a faster internal hash (texthash.batch_content_hash, used by
    dedup_exact where the key stays internal) would break the mirror.

    Vectorization shape (round 5): lowering AND whitespace normalization
    run as Arrow kernels (utf8_lower + replace_substring_regex with the
    explicit 6-byte class — identical to _WS_RE), so no Python string is
    ever built; md5 then runs over zero-copy memoryview slices of the
    normalized column's single data buffer. The only per-row Python left
    is the hashlib call itself, which is the contract."""
    norm = pc.replace_substring_regex(
        pc.utf8_lower(batch.column("text")), pattern=r"[ \t\n\r\x0b\x0c]+", replacement=" "
    )
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    from .texthash import _string_buffer_view

    offsets, data = _string_buffer_view(norm)
    mv = memoryview(data)
    md5 = hashlib.md5
    # NULL text stays NULL — the mirror's md5(NULL) IS NULL (parity fuzz);
    # a null slot has a zero-length slice, so mask explicitly
    if norm.null_count:
        nulls = pc.is_null(norm).to_numpy(zero_copy_only=False)
        fps = [
            None if nulls[i]
            else md5(mv[offsets[i]:offsets[i + 1]]).hexdigest()
            for i in range(len(norm))
        ]
    else:
        fps = [
            md5(mv[lo:hi]).hexdigest()
            for lo, hi in zip(offsets[:-1].tolist(), offsets[1:].tolist())
        ]
    return pa.table(
        {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps, pa.string())}
    )


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def q_text_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(
        text_stats_batch, batch_format="pyarrow", **remote_kwargs()
    )


def q_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(
        lang_id_batch, batch_format="pyarrow", **remote_kwargs()
    )


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(
        fingerprint_batch, batch_format="pyarrow", **remote_kwargs()
    )


def _sub_count_sql(expr: str, sub: str) -> str:
    return f"(length({expr}) - length(replace({expr}, '{sub}', ''))) // {len(sub)}"


_PUNCT_SQL = " + ".join(_sub_count_sql("text", c) for c in PUNCT_CHARS)
_STOP_SQL = " + ".join(_sub_count_sql("text", f" {w} ") for w in STOPWORDS)

# coalesce(text, '') — NULL counts as '' like the Ray kernels (fill_null);
# without it, DuckDB's NULL-ignoring least() yields a phantom 0.7 quality
# for NULL docs (parity-fuzz finding)
_TEXT_STATS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         {_sub_count_sql('text', ' ')} + 1 AS ws_tokens,
         len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS bpe_tokens,
         ({_PUNCT_SQL}) AS punct,
         ({_STOP_SQL}) AS stop_hits
  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))
SELECT doc_id, n_chars, ws_tokens, bpe_tokens,
  round(0.4 * least(1.0, ws_tokens / 100.0)
      + 0.3 * least(1.0, 10.0 * (CASE WHEN ws_tokens > 0
                                 THEN stop_hits / CAST(ws_tokens AS DOUBLE) ELSE 0 END))
      + 0.3 * (1.0 - least(1.0, 10.0 * (CASE WHEN n_chars > 0
                                 THEN punct / CAST(n_chars AS DOUBLE) ELSE 0 END))),
      6) AS quality
FROM s
"""

_LANG_SCORE_SQLS = [
    "(" + " + ".join(_sub_count_sql("lower(text)", m) for m in markers) + ")"
    for _lang, markers in LANG_MARKERS
]
_LANG_ID_SQL = f"""
WITH s AS (
  SELECT doc_id,
         {_LANG_SCORE_SQLS[0]} AS s_en, {_LANG_SCORE_SQLS[1]} AS s_de,
         {_LANG_SCORE_SQLS[2]} AS s_fr, {_LANG_SCORE_SQLS[3]} AS s_es
  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))
SELECT doc_id,
  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS pred_lang,
  s_en AS en_hits
FROM s
"""

_FINGERPRINT_SQL = (
    "SELECT doc_id, md5(lower(regexp_replace(text, '[ \\t\\n\\r\\x0b\\x0c]+', ' ', 'g'))) AS fingerprint"
    " FROM documents"
)

# ---------------------------------------------------------------------------
# rolling-hash fingerprint (winnowing-style): Rabin-Karp over byte k-grams,
# min-hash per document — near-identical docs share the fingerprint even
# under local edits outside the minimizing window. Fully vectorized: modular
# arithmetic is uint64 wraparound, prefix-hash trick, one pass per batch.
# ---------------------------------------------------------------------------

ROLL_K = 16
ROLL_BASE = np.uint64(1000003)


_ROLL_BASE_INV = np.uint64(pow(int(ROLL_BASE), -1, 1 << 64))  # B odd => invertible


def rolling_fingerprint_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    off_dtype = np.int64 if pa.types.is_large_string(text.type) else np.int32
    offsets = np.frombuffer(text.buffers()[1], dtype=off_dtype)[
        text.offset : text.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(text.buffers()[2], dtype=np.uint8)
    L = len(data)
    with np.errstate(over="ignore"):
        # prefix[i] = sum_{j<i} b_j * B^(i-1-j)  mod 2^64, computed WITHOUT a
        # serial scan: p_i = B^(i-1) * cumsum(b_j * B^-j) (B odd => B^-1
        # exists mod 2^64); uint64 overflow IS the modulus
        pw = np.full(L + 1, ROLL_BASE, dtype=np.uint64)
        pw[0] = 1
        np.cumprod(pw, out=pw)  # pw[i] = B^i
        ipw = np.full(L, _ROLL_BASE_INV, dtype=np.uint64)
        if L:
            ipw[0] = 1
        np.cumprod(ipw, out=ipw)  # ipw[j] = B^-j
        s = np.cumsum(data.astype(np.uint64) * ipw, dtype=np.uint64)
        prefix = np.zeros(L + 1, dtype=np.uint64)
        if L:
            prefix[1:] = pw[:L] * s
        # window hash of data[i : i+K); a batch whose total bytes are under K
        # has no windows at all (pw is only L+1 long then)
        if L >= ROLL_K:
            h = prefix[ROLL_K:] - prefix[: L + 1 - ROLL_K] * pw[ROLL_K]
        else:
            h = np.zeros(0, dtype=np.uint64)
        fps = np.zeros(n, dtype=np.uint64)
        long_m = (offsets[1:] - offsets[:-1]) >= ROLL_K
        if long_m.any() and len(h):
            # mask the windows that straddle a doc boundary (the K-1 start
            # positions before each boundary), then segment-min per doc.
            # reduceat runs over LONG docs' starts only: those are always
            # < len(h) (no clipping, so no segment truncation), and every
            # window position of an intervening short/empty doc straddles a
            # boundary and is therefore masked.
            hm = h.copy()
            bad = (offsets[1:, None] - np.arange(1, ROLL_K)).ravel()
            bad = bad[(bad >= 0) & (bad < len(hm))]
            hm[bad] = np.uint64(0xFFFFFFFFFFFFFFFF)
            long_starts = offsets[:-1][long_m]
            fps[long_m] = np.minimum.reduceat(hm, long_starts)
        short_m = ~long_m & (offsets[1:] > offsets[:-1])
        if short_m.any():
            lo, hi = offsets[:-1][short_m], offsets[1:][short_m]
            fps[short_m] = prefix[hi] - prefix[lo] * pw[hi - lo]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "roll_fp": pa.array(fps.astype(np.int64), pa.int64()),
        }
    )


def q_rolling_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(
        rolling_fingerprint_batch, batch_format="pyarrow", **remote_kwargs()
    )


def _rolling_fingerprint_sql() -> str:
    """Exact DuckDB mirror of q_rolling_fingerprint (SQL-gated since
    round 5). Byte-for-byte the same Rabin-Karp fold: document bytes are
    recovered from hex(encode(text)), every complete K-byte window folds as
    SUM(byte * B^(K-1-r)) mod 2^64 (terms < 2^72, K = 16 of them — fits
    HUGEINT with one final mod), a document's fingerprint is the unsigned
    MIN over its window folds; documents shorter than K fold their whole
    byte string; empty/NULL docs are 0. The B^k power table is K literals
    inlined from Python (no recursion), so unlike the word-hash mirrors
    this one needs no WITH RECURSIVE. The mirror's weight join replaces the
    numpy prefix-hash trick (same values, O(bytes x K) instead of O(bytes)
    — irrelevant at gate scale)."""
    from .sqlhash import M64, uint64_to_int64_sql

    B, K = int(ROLL_BASE), ROLL_K
    pw = [pow(B, k, M64) for k in range(K)]
    # wts: weight of the byte at window offset r (r = 0 is the window head)
    wts = ", ".join(f"({r}, {pw[K - 1 - r]}::HUGEINT)" for r in range(K))
    # pws: B^k for the short-doc whole-string fold (k = L-1-pos <= K-2)
    pws = ", ".join(f"({k}, {pw[k]}::HUGEINT)" for k in range(K - 1))
    return f"""
WITH
docs AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS L
  FROM documents),
bval AS (
  SELECT doc_id, L, pos,
         ((strpos('0123456789ABCDEF', substring(hx, 2*pos + 1, 1)) - 1) * 16
          + strpos('0123456789ABCDEF', substring(hx, 2*pos + 2, 1)) - 1)::HUGEINT AS v
  FROM (SELECT doc_id, L, hx, unnest(range(0, L)) AS pos FROM docs WHERE L > 0)),
long_fp AS (
  SELECT doc_id, MIN(h) AS fp FROM (
    SELECT doc_id, pos - r AS w, SUM(v * wt) % {M64}::HUGEINT AS h
    FROM bval JOIN (VALUES {wts}) wts(r, wt) ON TRUE
    WHERE L >= {K} AND pos - r BETWEEN 0 AND L - {K}
    GROUP BY doc_id, pos - r)
  GROUP BY doc_id),
short_fp AS (
  SELECT doc_id, SUM(v * pw) % {M64}::HUGEINT AS fp
  FROM bval JOIN (VALUES {pws}) pws(k, pw) ON k = L - 1 - pos
  WHERE L < {K}
  GROUP BY doc_id)
SELECT d.doc_id,
       {uint64_to_int64_sql("coalesce(f.fp, 0::HUGEINT)")} AS roll_fp
FROM documents d
LEFT JOIN (SELECT * FROM long_fp UNION ALL SELECT * FROM short_fp) f
  USING (doc_id)
ORDER BY d.doc_id
"""


def q_quality_filter(sf_dir: str):
    """Training-data quality gate: doc_ids whose quality score clears the
    threshold (the keep-set of a corpus filter), computed in the same pass
    as the stats."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        stats = text_stats_batch(batch)
        mask = pc.greater_equal(stats.column("quality"), QUALITY_THRESHOLD)
        return stats.filter(mask).select(["doc_id", "quality"])

    return _docs(sf_dir).map_batches(
        keep, batch_format="pyarrow", **remote_kwargs()
    )


QUALITY_THRESHOLD = 0.5

_QUALITY_FILTER_SQL = (
    f"WITH q AS ({_TEXT_STATS_SQL}) SELECT doc_id, quality FROM q"
    f" WHERE quality >= {QUALITY_THRESHOLD}"
)


def make_local_topk_block(k: int):
    """Per-block partial top-k over final (token, n) rows by (n desc, token
    asc). Each token appears in exactly ONE block after the two-phase count,
    so the union of the blocks' local top-k always contains the global top-k
    — the driver folds |blocks| x k rows, never the vocabulary. Shared by
    text_top_tokens (k=TOP_TOKENS) and corpus_vocab (k=LM_VOCAB_K) so the
    tie-break order cannot drift between them."""

    def _local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return _local


def q_top_tokens(sf_dir: str):
    """Corpus vocabulary: top tokens by occurrence count via a word-level
    flat-map fan-out -> salted two-phase count -> per-block partial top-k ->
    tiny driver fold. The heavy exchange carries only (token, count)
    partials, and the driver-side table is bounded by O(k x blocks) — the
    full distinct-token table (billions of rows at web scale) never leaves
    the workers."""
    from ..stages.aggregate import counts_by

    counts = counts_by(
        _docs(sf_dir).map_batches(
            _words_token_table, batch_format="pyarrow", **remote_kwargs()
        ),
        ["token"],
    )
    partials = counts.map_batches(
        make_local_topk_block(TOP_TOKENS), batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    if len(partials) == 0:  # empty corpus
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "token": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    # fold the tiny partials with the same deterministic order
    df = partials.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable"
    ).head(TOP_TOKENS).reset_index(drop=True)
    df["rank"] = range(1, len(df) + 1)
    return pa.Table.from_pandas(df[["rank", "token", "n"]], preserve_index=False)


TOP_TOKENS = 25

_TOP_TOKENS_SQL = f"""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                            x -> x != '')) AS token
  FROM documents),
c AS (SELECT token, count(*) AS n FROM w GROUP BY 1),
r AS (SELECT token, n,
             row_number() OVER (ORDER BY n DESC, token) AS rank FROM c)
SELECT rank, token, n FROM r WHERE rank <= {TOP_TOKENS} ORDER BY rank
"""


# ---------------------------------------------------------------------------
# adjacent-pair statistics — the first step of BPE-style tokenizer training:
# corpus-wide counts of adjacent whitespace-token pairs, top-K. Same shape
# as text_top_tokens: one flat-map to pair rows (pairs never cross document
# boundaries), salted two-phase count, per-block partial top-k, tiny driver
# fold — the full distinct-pair table never leaves the workers.
# ---------------------------------------------------------------------------

TOP_BIGRAMS = 25


def _bigram_table(batch: pa.Table) -> pa.Table:
    flat, parents = _words_flat(batch)
    if len(flat) < 2:
        return pa.table({"bigram": pa.array([], pa.string())})
    left = flat.slice(0, len(flat) - 1)
    right = flat.slice(1)
    same_doc = parents[1:] == parents[:-1]
    pairs = pc.binary_join_element_wise(left, right, " ")
    return pa.table({"bigram": pairs.filter(pa.array(same_doc))})


def q_top_bigrams(sf_dir: str):
    """(rank, bigram, n): top adjacent-token pairs corpus-wide, the same
    deterministic (n desc, bigram asc) order as text_top_tokens."""
    from ..stages.aggregate import counts_by

    counts = counts_by(
        _docs(sf_dir).map_batches(
            _bigram_table, batch_format="pyarrow", **remote_kwargs()
        ),
        ["bigram"],
    )

    def _local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "bigram"], ascending=[False, True], kind="stable"
        ).head(TOP_BIGRAMS)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = counts.map_batches(
        _local, batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    if len(partials) == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "bigram": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    df = partials.sort_values(
        ["n", "bigram"], ascending=[False, True], kind="stable"
    ).head(TOP_BIGRAMS).reset_index(drop=True)
    df["rank"] = range(1, len(df) + 1)
    return pa.Table.from_pandas(df[["rank", "bigram", "n"]],
                                preserve_index=False)


_TOP_BIGRAMS_SQL = f"""
WITH t AS (
  SELECT list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'), x -> x != '') AS toks
  FROM documents),
b AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2),
c AS (SELECT bigram, count(*) AS n FROM b GROUP BY 1),
r AS (SELECT bigram, n,
             row_number() OVER (ORDER BY n DESC, bigram) AS rank FROM c)
SELECT rank, bigram, n FROM r WHERE rank <= {TOP_BIGRAMS} ORDER BY rank
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling — the training-data downsampling shape:
# per-stratum (language) rates applied via a CONTENT hash of the key, so the
# sample is reproducible across runs, machines, and partitionings (no RNG
# state), composes with resume, and is exactly SQL-mirrorable. Embarrassingly
# parallel: pure filter inside map_batches, no shuffle, no driver state.
# ---------------------------------------------------------------------------

#: per-language keep thresholds as 4-hex-digit prefixes of md5(doc_id):
#: keep iff md5 < threshold, i.e. rate = int(threshold, 16) / 65536
SAMPLE_THRESHOLDS = {"en": "8000", "de": "4000", "fr": "2000", "es": "1000"}


def sample_stratified_batch(batch: pa.Table) -> pa.Table:
    """md5 is retained DELIBERATELY here: the keep decision is the hash
    prefix itself and must be byte-reproducible by the DuckDB mirror's
    substr(md5(...)) — an internal vectorized hash would change which
    documents are sampled. hashlib is C (and the input is a short id
    string), so the loop is cheap relative to the scan it filters."""
    ids = batch.column("doc_id").to_pylist()
    langs = batch.column("lang").to_pylist()
    h4 = np.array(
        [hashlib.md5(str(i).encode()).hexdigest()[:4] for i in ids], dtype=object
    )
    thr = np.array([SAMPLE_THRESHOLDS.get(l, "0000") for l in langs], dtype=object)
    return batch.filter(pa.array(h4 < thr)).select(["doc_id", "lang"])


def q_sample_stratified(sf_dir: str):
    return _docs(sf_dir, columns=("doc_id", "lang")).map_batches(
        sample_stratified_batch, batch_format="pyarrow", **remote_kwargs()
    )


_SAMPLE_SQL = (
    "SELECT doc_id, lang FROM documents"
    " WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < CASE lang "
    + " ".join(
        f"WHEN '{l}' THEN '{t}'" for l, t in SAMPLE_THRESHOLDS.items()
    )
    + " ELSE '0000' END"
)


# ---------------------------------------------------------------------------
# weight-proportional sampling — each doc kept with probability ∝ its weight
# (importance sampling by length here; any positive int column works). The
# keep decision is EXACT integer arithmetic — a 48-bit md5 prefix compared
# against weight x scale — so there is no float RNG, no cross-engine ULP
# risk (an A-Res u^(1/w) ranking was measured 1-ULP-unstable between numpy
# and DuckDB ln), and the sample is reproducible across runs, machines and
# partitionings. Pure filter inside map_batches: no shuffle, no driver state.
# ---------------------------------------------------------------------------

#: keep iff h48(doc_id) < n_chars * SCALE; 2^48 / SCALE = 2011 chars ≙ rate 1
WEIGHTED_SAMPLE_SCALE = 140_000_000_000


def sample_weighted_batch(batch: pa.Table) -> pa.Table:
    """md5 retained DELIBERATELY (same contract note as
    sample_stratified_batch): the keep decision IS the hash value and must
    be byte-reproducible by the mirror's substr(md5(...))."""
    ids = batch.column("doc_id").to_pylist()
    h48 = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) for i in ids],
        dtype=np.int64,
    )
    w = (
        batch.column("n_chars").to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return batch.filter(pa.array(h48 < w * WEIGHTED_SAMPLE_SCALE)).select(
        ["doc_id", "lang", "n_chars"]
    )


def q_sample_weighted(sf_dir: str):
    return _docs(sf_dir, columns=("doc_id", "lang", "n_chars")).map_batches(
        sample_weighted_batch, batch_format="pyarrow", **remote_kwargs()
    )


_SAMPLE_WEIGHTED_SQL = (
    "SELECT doc_id, lang, n_chars FROM documents"
    " WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))"
    " AS BIGINT)"
    f" < n_chars * {WEIGHTED_SAMPLE_SCALE}"
)


# ---------------------------------------------------------------------------
# global top-N by score — the "pick the best documents" shape: per-block
# partial top-N over the streamed quality scores, tiny driver fold; no
# global sort ever runs (the same partial/fold pattern as text_top_tokens)
# ---------------------------------------------------------------------------

TOP_QUALITY_N = 50


def q_top_quality(sf_dir: str):
    def local_top(batch: pa.Table) -> pa.Table:
        stats = text_stats_batch(batch)
        df = stats.to_pandas().sort_values(
            ["quality", "doc_id"], ascending=[False, True], kind="stable"
        ).head(TOP_QUALITY_N)
        return pa.Table.from_pandas(
            df[["doc_id", "quality"]], preserve_index=False
        )

    partials = _docs(sf_dir).map_batches(
        local_top, batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    if len(partials) == 0:  # empty corpus
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "quality": pa.array([], pa.float64())}
        )
    df = partials.sort_values(
        ["quality", "doc_id"], ascending=[False, True], kind="stable"
    ).head(TOP_QUALITY_N).reset_index(drop=True)
    df["rank"] = range(1, len(df) + 1)
    return pa.Table.from_pandas(
        df[["rank", "doc_id", "quality"]], preserve_index=False
    )


_TOP_QUALITY_SQL = f"""
WITH q AS ({_TEXT_STATS_SQL}),
r AS (SELECT doc_id, quality,
             row_number() OVER (ORDER BY quality DESC, doc_id) AS rank FROM q)
SELECT rank, doc_id, quality FROM r WHERE rank <= {TOP_QUALITY_N} ORDER BY rank
"""


# ---------------------------------------------------------------------------
# corpus-vocabulary features: per-doc vocab coverage (SQL-gated — a ratio of
# integer counts, so float division is bit-identical across engines) and a
# unigram language-model score (rows-only — mean-of-logs is summation-order
# sensitive at the 6th decimal, so it is pinned against an exact Python
# oracle instead of DuckDB). The top-K vocabulary is built with the same
# distributed partial-top-k fold as text_top_tokens and broadcast ONCE via
# ray.put; scoring is index_in + take + reduceat per batch.
# ---------------------------------------------------------------------------

LM_VOCAB_K = 500
LM_OOV_COUNT = 0.5  # pseudo-count for out-of-vocabulary tokens


def _words_token_table(batch: pa.Table) -> pa.Table:
    """documents batch -> one (token) row per whitespace token (flat-map)."""
    flat, _parents = _words_flat(batch)
    return pa.table({"token": pc.cast(flat, pa.string())})


def _words_flat(batch: pa.Table):
    """(flat tokens array, parents row indices) for a documents batch.

    NULL text rows contribute no tokens (list flatten already skips null
    lists; the null list's NaN length must become 0 before np.repeat, or
    the float cast crashes) — matching the SQL mirrors, where
    string_split_regex(NULL) unnests to nothing."""
    toks = pc.split_pattern_regex(batch.column("text"), pattern=r"[ \t\n\r\x0b\x0c]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    counts = np.nan_to_num(
        pc.list_value_length(toks)
        .to_numpy(zero_copy_only=False).astype(np.float64)
    ).astype(np.int64)
    parents = np.repeat(np.arange(batch.num_rows), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    return flat.filter(pa.array(keep)), parents[keep]


def corpus_vocab(sf_dir: str, k: int = LM_VOCAB_K):
    """(vocab tokens pa.array, counts float64[k], corpus total tokens) —
    vocabulary = top-k tokens by count with (count desc, token asc) order."""
    from ray.data.aggregate import Sum

    from ..stages.aggregate import counts_by

    counts = counts_by(
        _docs(sf_dir).map_batches(
            _words_token_table, batch_format="pyarrow", **remote_kwargs()
        ),
        ["token"],
    ).materialize()
    total_raw = counts.aggregate(Sum("n"))["sum(n)"]
    if total_raw is None:  # empty corpus: no tokens anywhere
        return pa.array([], pa.string()), np.zeros(0), 0
    total = int(total_raw)

    partials = counts.map_batches(
        make_local_topk_block(k), batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    top = partials.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    return (
        pa.array(top["token"], pa.string()),
        top["n"].to_numpy().astype(np.float64),
        total,
    )


def _vocab_score_fn(vocab_ref, want_lm: bool, micro: bool = False):
    """micro=True returns the INTEGER per-doc mean NLL (floor-divided
    micro-nats) instead of the float lm_score — the bucket metric of
    q_perplexity_buckets, exact under any distributed fold order."""
    import ray

    def _score(batch: pa.Table) -> pa.Table:
        vocab, vcounts, total = ray.get(vocab_ref)
        flat, parents = _words_flat(batch)
        doc_tok = np.bincount(parents, minlength=batch.num_rows)
        has = doc_tok > 0  # token-less docs are absent (SQL: no w rows)
        idx_arr = pc.index_in(flat, value_set=vocab)
        idx = idx_arr.to_numpy(zero_copy_only=False)
        valid = (
            ~np.isnan(idx)
            if idx.dtype.kind == "f"
            else idx_arr.is_valid().to_numpy(zero_copy_only=False)
        )
        offs = np.zeros(batch.num_rows + 1, dtype=np.int64)
        np.cumsum(doc_tok, out=offs[1:])
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[has]
        if want_lm:
            # per-token negative log-prob quantized to INTEGER micro-nats
            # BEFORE the per-doc sum: the sum is then exact int64 arithmetic
            # in any order/engine, and the final score is ONE float division
            # of identical integers — bit-identical across Ray and DuckDB,
            # where a float sum would drift with summation order. The 1e6
            # quantizer also absorbs last-ulp ln() differences between numpy
            # and DuckDB (a mismatch needs the product within ~2.5e-9 of a
            # rounding boundary). This is the round-4 SQL-gating contract.
            if total == 0:  # token-less corpus: no doc has `has` set anyway
                vm, oov_m = np.zeros(0, np.int64), np.int64(0)
            else:
                vm = np.rint(-np.log(vcounts / total) * 1e6).astype(np.int64)
                oov_m = np.int64(np.rint(-np.log(LM_OOV_COUNT / total) * 1e6))
            t_micro = np.where(
                valid, vm[np.nan_to_num(idx, nan=0).astype(np.int64)], oov_m
            )
            sums = (
                np.add.reduceat(t_micro, offs[:-1][has])
                if has.any()
                else np.zeros(0, np.int64)
            )
            if micro:
                # floor division of non-negative int64s — identical to
                # DuckDB's integer `//` on the same values
                return pa.table(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "lm_micro": pa.array(
                            sums // doc_tok[has], pa.int64()
                        ),
                    }
                )
            score = sums.astype(np.float64) / (doc_tok[has] * 1e6)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "lm_score": pa.array(score, pa.float64()),
                }
            )
        inv = valid.astype(np.int64)
        n_in = np.add.reduceat(inv, offs[:-1][has]) if has.any() else np.zeros(0, np.int64)
        # integer counts, not a rounded ratio: round-half semantics differ
        # between numpy (banker's) and DuckDB (half-away), so a doc with
        # e.g. 1 in-vocab token out of 128 would hash-mismatch at 6 dp
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(doc_tok[has], pa.int64()),
                "n_in_vocab": pa.array(n_in, pa.int64()),
            }
        )

    return _score


def q_vocab_coverage(sf_dir: str):
    import ray

    ref = ray.put(corpus_vocab(sf_dir))
    return _docs(sf_dir).map_batches(
        _vocab_score_fn(ref, want_lm=False), batch_format="pyarrow", **remote_kwargs()
    )


def q_lm_score(sf_dir: str):
    import ray

    ref = ray.put(corpus_vocab(sf_dir))
    return _docs(sf_dir).map_batches(
        _vocab_score_fn(ref, want_lm=True), batch_format="pyarrow", **remote_kwargs()
    )


_VOCAB_CTE = f"""
WITH w AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                                    x -> x != '')) AS token
  FROM documents),
c AS (SELECT token, count(*) AS n FROM w GROUP BY 1),
v AS (SELECT token, n FROM (
        SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS r
        FROM c) WHERE r <= {LM_VOCAB_K})
"""

_COVERAGE_SQL = (
    _VOCAB_CTE
    + "SELECT w.doc_id, count(*) AS n_tokens, count(v.token) AS n_in_vocab"
    " FROM w LEFT JOIN v USING (token) GROUP BY 1"
)

# lm_score mirror: per-token NLL quantized to integer micro-nats before the
# per-doc sum (see _vocab_score_fn) — the sum is exact BIGINT in any order,
# and the score is one division of identical integers, so the float bits
# match numpy's exactly. round() vs np.rint differ only at exact .5
# products, which last-ulp ln() noise reaches with probability ~5e-9 per
# distinct count value.
#: per-token micro-nat CTE — the single source of truth for the m values
#: BOTH _LM_SCORE_SQL and _PPL_BUCKETS_SQL fold (changing the OOV
#: pseudo-count or the quantizer here changes both gates together, the
#: same no-desync rule as decontam._word_gram_cte)
_LM_MICRO_CTE = f""",
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
t AS (SELECT w.doc_id AS doc_id,
        CAST(round(-ln(coalesce(CAST(v.n AS DOUBLE), {LM_OOV_COUNT})
                       / (SELECT total FROM tot)) * 1000000) AS BIGINT) AS m
      FROM w LEFT JOIN v USING (token))"""

_LM_SCORE_SQL = (
    _VOCAB_CTE
    + _LM_MICRO_CTE
    + """
SELECT doc_id, CAST(sum(m) AS DOUBLE) / (count(*) * 1000000.0) AS lm_score
FROM t GROUP BY doc_id
"""
)


# ---------------------------------------------------------------------------
# repetition signal (Gopher-style): the most frequent token's count per doc
# vs the doc's token total — high ratios flag boilerplate/spam. Integer
# outputs, so the SQL mirror is exact. Vectorized: Arrow dictionary_encode
# hashes tokens in C++, one lexsort + two reduceats do the per-(doc, token)
# counting and per-doc max/sum.
# ---------------------------------------------------------------------------

def repetition_batch(batch: pa.Table) -> pa.Table:
    flat, parents = _words_flat(batch)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_tokens": pa.array([], pa.int64()),
         "top_token_count": pa.array([], pa.int64())}
    )
    if len(parents) == 0:
        return empty
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    K = max(len(enc.dictionary), 1)
    key = parents * K + codes
    order = np.argsort(key, kind="stable")
    sk = key[order]
    grp_start = np.ones(len(sk), dtype=bool)
    grp_start[1:] = sk[1:] != sk[:-1]
    starts = np.flatnonzero(grp_start)
    kcounts = np.diff(np.append(starts, len(sk)))
    grp_parent = parents[order][starts]
    doc_start = np.ones(len(grp_parent), dtype=bool)
    doc_start[1:] = grp_parent[1:] != grp_parent[:-1]
    dstarts = np.flatnonzero(doc_start)
    top = np.maximum.reduceat(kcounts, dstarts)
    total = np.add.reduceat(kcounts, dstarts)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[grp_parent[dstarts]]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(total.astype(np.int64), pa.int64()),
            "top_token_count": pa.array(top.astype(np.int64), pa.int64()),
        }
    )


def q_repetition(sf_dir: str):
    return _docs(sf_dir).map_batches(
        repetition_batch, batch_format="pyarrow", **remote_kwargs()
    )


_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                                    x -> x != '')) AS token
  FROM documents),
c AS (SELECT doc_id, token, count(*) AS k FROM w GROUP BY 1, 2)
SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
       CAST(max(k) AS BIGINT) AS top_token_count
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# PII scrub — the training-data redaction shape: sequential RE2 passes
# (emails, then long digit runs on the already-email-redacted text) counted
# and replaced wholly inside map_batches via Arrow's RE2 kernels. No
# shuffle, no state; DuckDB mirrors it exactly because its regexp functions
# are RE2 too, so the redacted TEXT itself is value-hash-gated. The fixture
# corpus contains no PII (the gate pins the no-op path byte-for-byte);
# planted-PII redaction is pinned in pytest.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_DIGITS_RE = r"[0-9]{7,}"  # phone/account/ssn-style long digit runs
PII_TOKEN = "<PII>"


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    # NULL text counts as '' (mirror coalesces identically — parity fuzz)
    text = pc.fill_null(batch.column("text"), "")
    n_email = (
        pc.count_substring_regex(text, pattern=PII_EMAIL_RE)
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )
    t1 = pc.replace_substring_regex(
        text, pattern=PII_EMAIL_RE, replacement=PII_TOKEN
    )
    n_digits = (
        pc.count_substring_regex(t1, pattern=PII_DIGITS_RE)
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )
    clean = pc.replace_substring_regex(
        t1, pattern=PII_DIGITS_RE, replacement=PII_TOKEN
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_pii": pa.array(n_email + n_digits, pa.int64()),
            "clean_text": clean,
        }
    )


def q_pii_scrub(sf_dir: str):
    return _docs(sf_dir).map_batches(
        pii_scrub_batch, batch_format="pyarrow", **remote_kwargs()
    )


_PII_SQL = f"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n1,
         regexp_replace(text, '{PII_EMAIL_RE}', '{PII_TOKEN}', 'g') AS t1
  FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))
SELECT doc_id,
       CAST(n1 + len(regexp_extract_all(t1, '{PII_DIGITS_RE}')) AS BIGINT)
         AS n_pii,
       regexp_replace(t1, '{PII_DIGITS_RE}', '{PII_TOKEN}', 'g') AS clean_text
FROM s1
"""


# ---------------------------------------------------------------------------
# document chunking — the training-data windowing shape: each document is
# split into fixed-size token windows with overlap (chunk i covers tokens
# [i*STRIDE, i*STRIDE + SIZE)), the unit a tokenizer/packing stage consumes.
# Fully vectorized flat-map: one tokenize pass, the overlapping windows are
# materialized with a single gather (arange/repeat index build + take) and
# re-joined with Arrow's binary_join — no per-doc Python. Chunk text is the
# single-space join of its tokens (DEFINED semantics, mirrored exactly by
# DuckDB's array_to_string over the same list slice).
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # 16-token overlap


def chunk_documents_batch(batch: pa.Table) -> pa.Table:
    flat, parents = _words_flat(batch)
    n_docs = batch.num_rows
    doc_tok = np.bincount(parents, minlength=n_docs)
    doc_tok_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(doc_tok, out=doc_tok_start[1:])
    n_chunks = -(-doc_tok // CHUNK_STRIDE)  # ceil; 0 tokens -> 0 chunks
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "chunk_idx": pa.array([], pa.int64()),
         "n_tokens": pa.array([], pa.int64()),
         "chunk_text": pa.array([], pa.string())}
    )
    total = int(n_chunks.sum())
    if total == 0:
        return empty
    doc_of_chunk = np.repeat(np.arange(n_docs), n_chunks)
    # chunk_idx within each doc: global arange minus each doc's first chunk
    first_chunk = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=first_chunk[1:])
    cidx = np.arange(total) - np.repeat(first_chunk[:-1], n_chunks)
    start = cidx * CHUNK_STRIDE
    length = np.minimum(doc_tok[doc_of_chunk] - start, CHUNK_SIZE)
    # gather all chunk tokens in one take: indices = start offsets repeated
    # + within-chunk arange
    tok_offs = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(length, out=tok_offs[1:])
    idx = (
        np.repeat(doc_tok_start[doc_of_chunk] + start, length)
        + np.arange(int(tok_offs[-1]))
        - np.repeat(tok_offs[:-1], length)
    )
    gathered = flat.take(pa.array(idx))
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(tok_offs, pa.int32()).cast(pa.int32()), pc.cast(gathered, pa.string())
    )
    text = pc.binary_join(chunk_lists, " ")
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids[doc_of_chunk], pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "n_tokens": pa.array(length.astype(np.int64), pa.int64()),
            "chunk_text": text,
        }
    )


def q_chunk_documents(sf_dir: str):
    return _docs(sf_dir).map_batches(
        chunk_documents_batch, batch_format="pyarrow", **remote_kwargs()
    )


_CHUNK_SQL = f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                             x -> x != '') AS toks
  FROM documents),
c AS (
  SELECT doc_id, toks, len(toks) AS n, t.j AS chunk_idx
  FROM tk, LATERAL (
    SELECT unnest(range(CAST(ceil(len(toks) / {CHUNK_STRIDE}.0) AS BIGINT)))
      AS j) t)
SELECT doc_id, chunk_idx,
       least(n - chunk_idx * {CHUNK_STRIDE}, {CHUNK_SIZE}) AS n_tokens,
       array_to_string(
         toks[chunk_idx * {CHUNK_STRIDE} + 1 :
              least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)], ' ')
         AS chunk_text
FROM c
"""


register("text_chunking", q_chunk_documents, _CHUNK_SQL)
register("text_pii_scrub", q_pii_scrub, _PII_SQL)
register("text_repetition", q_repetition, _REPETITION_SQL)
register("text_vocab_coverage", q_vocab_coverage, _COVERAGE_SQL)
register("text_lm_score", q_lm_score, _LM_SCORE_SQL)  # micro-nat contract
register("text_top_quality", q_top_quality, _TOP_QUALITY_SQL)
register("text_sample_stratified", q_sample_stratified, _SAMPLE_SQL)
register("text_sample_weighted", q_sample_weighted, _SAMPLE_WEIGHTED_SQL)
register("text_stats", q_text_stats, _TEXT_STATS_SQL)
register("text_quality_filter", q_quality_filter, _QUALITY_FILTER_SQL)
# ---------------------------------------------------------------------------
# tokenize-to-ids — the unit a trainer actually consumes: map every token
# to its 1-based rank in the corpus top-K vocabulary (0 = OOV), one
# list<int32> per document. The vocabulary is built once (the same
# deterministic (count desc, token asc) fold corpus_vocab/lm_score use)
# and broadcast via ray.put; the encode pass is one dictionary-encode +
# ONE searchsorted per batch — tokens never shuffle.
# ---------------------------------------------------------------------------

def _tokenize_fn(vocab_ref):
    """Encode via pc.index_in against the rank-ordered vocab (the same
    native idiom _vocab_score_fn uses): index+1 IS the 1-based rank, null
    (not found) -> 0. No Python-object token materialization."""
    import ray

    def encode(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        flat, parents = _words_flat(batch)
        n = batch.num_rows
        counts = np.bincount(parents, minlength=n) if len(parents) else (
            np.zeros(n, dtype=np.int64)
        )
        if len(flat) and len(vocab):
            idx = pc.index_in(flat, value_set=vocab)
            ids = (
                pc.fill_null(pc.add(idx, 1), 0)
                .cast(pa.int32()).to_numpy(zero_copy_only=False)
                .astype(np.int32)
            )
        else:
            ids = np.zeros(len(flat), dtype=np.int32)
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(ids, pa.int32())
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(counts.astype(np.int64), pa.int64()),
                "ids": lst,
            }
        )

    return encode


def tokenize_ids_dataset(sf_dir: str):
    """(doc_id, n_tokens, ids list<int32>) — the library form a trainer
    consumes directly."""
    import ray

    vocab, _counts, _total = corpus_vocab(sf_dir)  # already rank-ordered
    vocab_ref = ray.put(vocab)
    return _docs(sf_dir).map_batches(
        _tokenize_fn(vocab_ref), batch_format="pyarrow", **remote_kwargs()
    )


def q_tokenize_ids(sf_dir: str):
    """Gate form of tokenize_ids_dataset: ids rendered as a space-joined
    string so the driver's value-hash sees a scalar column (no SQL-gated
    query has shipped a list column through the gate before; list-vs-array
    CSV formatting across engines is not a contract worth betting on)."""

    def stringify(t: pa.Table) -> pa.Table:
        ids = t.column("ids")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "ids_str": pc.binary_join(
                    pc.cast(ids, pa.list_(pa.string())), " "
                ),
            }
        )

    return tokenize_ids_dataset(sf_dir).map_batches(
        stringify, batch_format="pyarrow", **remote_kwargs()
    )


_TOKENIZE_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                             x -> x != '') AS toks
  FROM documents),
w AS (SELECT unnest(toks) AS token FROM t),
c AS (SELECT token, count(*) AS n FROM w GROUP BY 1),
v AS (SELECT token,
             CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS id
      FROM c QUALIFY id <= {LM_VOCAB_K}),
e AS (SELECT t.doc_id AS doc_id, r.i AS i, t.toks[r.i] AS tok
      FROM t, LATERAL (SELECT unnest(range(1, len(t.toks) + 1)) AS i) r),
j AS (SELECT e.doc_id, e.i, coalesce(v.id, 0) AS id
      FROM e LEFT JOIN v ON e.tok = v.token)
SELECT t.doc_id, coalesce(len(t.toks), 0) AS n_tokens,
       coalesce(array_to_string(ids.ids, ' '), '') AS ids_str
FROM t LEFT JOIN (
  SELECT doc_id, list(id ORDER BY i) AS ids FROM j GROUP BY 1
) ids USING (doc_id)
"""


register("text_top_tokens", q_top_tokens, _TOP_TOKENS_SQL)
register("text_top_bigrams", q_top_bigrams, _TOP_BIGRAMS_SQL)
register("text_tokenize_ids", q_tokenize_ids, _TOKENIZE_SQL)
register("text_lang_id", q_lang_id, _LANG_ID_SQL)
register("text_fingerprint", q_fingerprint, _FINGERPRINT_SQL)


# ---------------------------------------------------------------------------
# language x source confusion matrix — the corpus-composition report every
# web-crawl pipeline runs before mixing: for each (source, predicted lang)
# cell, how many docs land there and how many agree with the DECLARED lang
# column. Composes the lang-ID scorer with a two-phase count: the per-block
# partial collapses each block to its distinct (source, pred, declared-match)
# cells, so the exchange carries |sources| x |langs| x blocks rows, never
# documents. The mirror composes _LANG_ID_SQL as a CTE joined back to
# `documents` — same marker arithmetic on both sides.
# ---------------------------------------------------------------------------


def lang_source_partials(batch: pa.Table) -> pa.Table:
    """Per-block (source, pred_lang, n_docs, n_match) partial counts.
    NULL-text rows are dropped on both sides (stress corpora plant them)."""
    batch = batch.filter(batch.column("text").is_valid())
    if batch.num_rows == 0:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "pred_lang": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "n_match": pa.array([], pa.int64())}
        )
    pred = (
        lang_id_batch(batch.select(["doc_id", "text"]))
        .column("pred_lang").to_numpy(zero_copy_only=False).astype(str)
    )
    src = batch.column("source").to_numpy(zero_copy_only=False).astype(str)
    declared = batch.column("lang").to_numpy(zero_copy_only=False).astype(str)
    match = (pred == declared).astype(np.int64)
    order = np.lexsort((pred, src))
    src_s, pred_s, match_s = src[order], pred[order], match[order]
    boundary = (src_s[1:] != src_s[:-1]) | (pred_s[1:] != pred_s[:-1])
    first = np.flatnonzero(np.concatenate([[True], boundary]))
    return pa.table(
        {
            "source": pa.array(src_s[first], pa.string()),
            "pred_lang": pa.array(pred_s[first], pa.string()),
            "n_docs": pa.array(
                np.diff(np.append(first, len(src_s))).astype(np.int64),
                pa.int64(),
            ),
            "n_match": pa.array(np.add.reduceat(match_s, first), pa.int64()),
        }
    )


def q_lang_source_matrix(sf_dir: str):
    from ray.data.aggregate import Sum

    df = (
        _docs(sf_dir, columns=("doc_id", "text", "lang", "source"))
        .map_batches(lang_source_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["source", "pred_lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_match", alias_name="n_match"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "pred_lang": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "n_match": pa.array([], pa.int64())}
        )
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["n_match"] = df["n_match"].astype(np.int64)
    df = df.sort_values(["source", "pred_lang"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["source", "pred_lang", "n_docs", "n_match"]], preserve_index=False
    )


_LANG_SOURCE_SQL = f"""
WITH p AS ({_LANG_ID_SQL})
SELECT d.source, p.pred_lang,
       count(*) AS n_docs,
       CAST(count(*) FILTER (p.pred_lang = d.lang) AS BIGINT) AS n_match
FROM p JOIN documents d ON p.doc_id = d.doc_id
WHERE d.text IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

register("text_lang_source_matrix", q_lang_source_matrix, _LANG_SOURCE_SQL)
# SQL-gated since round 5: the Rabin-Karp window fold mirrored
# integer-exactly (see _rolling_fingerprint_sql).
register("text_rolling_fingerprint", q_rolling_fingerprint,
         _rolling_fingerprint_sql())


# ---------------------------------------------------------------------------
# Gopher-style rule filter — the published rule-based corpus-quality recipe
# (word-count bounds, mean-word-length bounds, alphabetic-word fraction,
# minimum distinct stopwords), one flag column per rule so drop accounting
# per rule is a trivial aggregate over the output. One vectorized pass per
# block (flatten once, every rule a bincount over the same parents array);
# nothing but the per-doc flag rows leaves the workers.

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 25, 80
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3.0, 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_STOPWORDS = ("a", "and", "be", "in", "is", "of", "the", "to")
GOPHER_MIN_STOPWORDS = 2


def _gopher_rules_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    flat, parents = _words_flat(batch)
    n_words = np.bincount(parents, minlength=n).astype(np.int64)
    lens = (
        pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    )
    sum_len = np.bincount(parents, weights=lens, minlength=n)
    alpha = (
        pc.match_substring_regex(flat, "[A-Za-z]")
        .to_numpy(zero_copy_only=False).astype(np.float64)
    )
    n_alpha = np.bincount(parents, weights=alpha, minlength=n)
    low = pc.utf8_lower(flat)
    n_stop = np.zeros(n, dtype=np.int64)
    for sw in GOPHER_STOPWORDS:  # loop over the 8 CONSTANTS, not rows
        m = pc.equal(low, sw).to_numpy(zero_copy_only=False).astype(bool)
        if m.any():
            n_stop += (np.bincount(parents[m], minlength=n) > 0)
    # one division per doc from exact integer tallies — identical float64
    # ops to the DuckDB mirror, so the boundary comparisons cannot diverge
    nz = np.maximum(n_words, 1).astype(np.float64)
    mean_len = np.where(n_words > 0, sum_len / nz, 0.0)
    alpha_frac = np.where(n_words > 0, n_alpha / nz, 0.0)
    r_nwords = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_mean_len = (mean_len >= GOPHER_MIN_MEAN_LEN) & (
        mean_len <= GOPHER_MAX_MEAN_LEN
    )
    r_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    r_stop = n_stop >= GOPHER_MIN_STOPWORDS
    keep = r_nwords & r_mean_len & r_alpha & r_stop
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "r_nwords": pa.array(r_nwords.astype(np.int64), pa.int64()),
            "r_mean_len": pa.array(r_mean_len.astype(np.int64), pa.int64()),
            "r_alpha": pa.array(r_alpha.astype(np.int64), pa.int64()),
            "r_stop": pa.array(r_stop.astype(np.int64), pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        }
    )


def q_gopher_rules(sf_dir: str):
    """Per-document Gopher-rule flags (1 = passes) + the composed keep bit.
    Embarrassingly parallel map_batches — no shuffle at any scale."""
    return _docs(sf_dir).map_batches(
        _gopher_rules_batch, batch_format="pyarrow", **remote_kwargs()
    )


_SW_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
_GOPHER_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '[ \\t\\n\\r\\x0b\\x0c]+'),
                     x -> x != '') AS toks
  FROM documents),
m AS (
  SELECT doc_id, len(toks) AS n_words,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x)))
                   / CAST(len(toks) AS DOUBLE) END AS mean_len,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                   / CAST(len(toks) AS DOUBLE) END AS alpha_frac,
         len(list_distinct(list_filter(list_transform(toks, x -> lower(x)),
             x -> x IN ({_SW_SQL})))) AS n_stop
  FROM t)
SELECT doc_id, n_words,
       CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS INT)
         AS r_nwords,
       CAST(mean_len >= {GOPHER_MIN_MEAN_LEN}
            AND mean_len <= {GOPHER_MAX_MEAN_LEN} AS INT) AS r_mean_len,
       CAST(alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} AS INT) AS r_alpha,
       CAST(n_stop >= {GOPHER_MIN_STOPWORDS} AS INT) AS r_stop,
       CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
            AND mean_len >= {GOPHER_MIN_MEAN_LEN}
            AND mean_len <= {GOPHER_MAX_MEAN_LEN}
            AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
            AND n_stop >= {GOPHER_MIN_STOPWORDS} AS INT) AS keep
FROM m ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# IDF top terms — document frequency (distinct docs containing each token)
# via within-block (doc, token) dedup (docs never span blocks) -> salted
# two-phase count -> per-block partial top-k -> tiny driver fold. N comes
# from parquet footers (zero data read). The full distinct-token DF table
# never leaves the workers.

TOP_IDF_TERMS = 50


def _doc_token_distinct(batch: pa.Table) -> pa.Table:
    """One row per DISTINCT (doc, token) in the block, emitting only the
    token — the downstream count is then document frequency."""
    flat, parents = _words_flat(batch)
    if len(flat) == 0:
        return pa.table({"token": pa.array([], pa.string())})
    d = pc.dictionary_encode(flat)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nd = len(d.dictionary)
    uniq = np.unique(parents.astype(np.int64) * nd + codes)
    toks = pc.take(d.dictionary, pa.array((uniq % nd).astype(np.int64)))
    return pa.table({"token": pc.cast(toks, pa.string())})


def q_idf_top_terms(sf_dir: str):
    """Top terms by document frequency with idf = ln(N / df) — the inverse
    side of text_top_tokens' term frequency. (df desc, token asc) order."""
    from ..parquet_stats import file_num_rows
    from ..stages.aggregate import counts_by

    n_docs = file_num_rows(os.path.join(sf_dir, "documents.parquet"))
    counts = counts_by(
        _docs(sf_dir).map_batches(
            _doc_token_distinct, batch_format="pyarrow", **remote_kwargs()
        ),
        ["token"],
    )
    partials = counts.map_batches(
        make_local_topk_block(TOP_IDF_TERMS), batch_format="pyarrow",
        **remote_kwargs(),
    ).to_pandas()
    if len(partials) == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "token": pa.array([], pa.string()),
             "df": pa.array([], pa.int64()),
             "idf": pa.array([], pa.float64())}
        )
    top = partials.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable"
    ).head(TOP_IDF_TERMS).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top = top.rename(columns={"n": "df"})
    top["idf"] = np.round(np.log(n_docs / top["df"].to_numpy(np.float64)), 6)
    return pa.Table.from_pandas(
        top[["rank", "token", "df", "idf"]], preserve_index=False
    )


_IDF_SQL = f"""
WITH w AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                            x -> x != '')) AS token
  FROM documents),
c AS (SELECT token, count(*) AS df FROM w GROUP BY 1),
n AS (SELECT count(*) AS nd FROM documents),
r AS (SELECT token, df,
             row_number() OVER (ORDER BY df DESC, token) AS rank FROM c)
SELECT rank, token, df,
       round(ln((SELECT nd FROM n) / CAST(df AS DOUBLE)), 6) AS idf
FROM r WHERE rank <= {TOP_IDF_TERMS} ORDER BY rank
"""


register("text_gopher_rules", q_gopher_rules, _GOPHER_SQL)
register("text_idf_top_terms", q_idf_top_terms, _IDF_SQL)


# ---------------------------------------------------------------------------
# perplexity bucketing — the CCNet recipe: partition the corpus into
# head / middle / tail by LM-score tertiles, so downstream mixing can
# oversample the "head" (closest to the reference LM) and discount the
# "tail". The bucket metric is the INTEGER per-doc mean NLL in micro-nats
# (sum of the lm_score contract's per-token micro-nats, floor-divided by
# the token count), which makes both the thresholds and the assignment
# exact in any engine and any fold order.
#
# Scale shape — no global sort, no rank column: pass 1 folds the bounded
# value DISTRIBUTION (metric resolution caps distinct cells at ~3e7 no
# matter the corpus size — the quantiles.py contract) through
# groupby(v).Sum and selects the two order statistics; the two thresholds
# broadcast into pass 2, an embarrassingly parallel bucket-compare map.
# Both passes reuse the ONE corpus vocabulary built and ray.put once.
# ---------------------------------------------------------------------------

#: tertile percents — nearest-rank ((n-1)*p)//100, the quantiles.py contract
PPL_BUCKET_PCTS = (33, 66)


def q_perplexity_buckets(sf_dir: str):
    """(doc_id, lm_micro, ppl_bucket): CCNet-style head/middle/tail by
    exact global tertiles of the integer micro-nat mean NLL. Ties at a
    threshold share a bucket (comparison-based, not rank-based), so the
    assignment is deterministic without a global sort."""
    import ray

    from .quantiles import (
        QUANTILE_MAX_GROUP,
        _dist_partials,
        _distribution_fold,
    )

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "lm_micro": pa.array([], pa.int64()),
         "ppl_bucket": pa.array([], pa.string())}
    )
    ref = ray.put(corpus_vocab(sf_dir))

    def scored():
        return _docs(sf_dir).map_batches(
            _vocab_score_fn(ref, want_lm=True, micro=True),
            batch_format="pyarrow", **remote_kwargs(),
        )

    def partials(batch: pa.Table) -> pa.Table:
        v = (
            batch.column("lm_micro")
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return _dist_partials(np.full(len(v), "g", dtype=object), v, "k")

    def select_thresholds(group: pa.Table) -> pa.Table:
        if group.num_rows > QUANTILE_MAX_GROUP:
            raise ValueError(
                f"perplexity distribution has {group.num_rows} distinct "
                f"micro-nat cells (> QUANTILE_MAX_GROUP="
                f"{QUANTILE_MAX_GROUP}); coarsen the quantizer or use "
                "sketch_value_quantiles for the thresholds"
            )
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = (
            group.column("cnt").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(v, kind="stable")
        v, cnt = v[order], cnt[order]
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        targets = np.array(
            [((n - 1) * p) // 100 for p in PPL_BUCKET_PCTS], dtype=np.int64
        )
        idx = np.searchsorted(cum, targets, side="right")
        return pa.table(
            {"t33": pa.array([int(v[idx[0]])], pa.int64()),
             "t66": pa.array([int(v[idx[1]])], pa.int64())}
        )

    th = _distribution_fold(
        scored(), partials, "k", select_thresholds
    ).to_pandas()
    if len(th) == 0:  # token-less corpus: no doc is scoreable
        return empty
    t33, t66 = int(th["t33"][0]), int(th["t66"][0])

    def bucket(batch: pa.Table) -> pa.Table:
        v = (
            batch.column("lm_micro")
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        lab = np.where(
            v <= t33, "head", np.where(v <= t66, "middle", "tail")
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "lm_micro": batch.column("lm_micro"),
             "ppl_bucket": pa.array(lab.astype(object), pa.string())}
        )

    return scored().map_batches(
        bucket, batch_format="pyarrow", **remote_kwargs()
    )


# mirror of _LM_SCORE_SQL's per-token micro-nat CTE, then BIGINT floor
# division for the metric, nearest-rank tertiles over per-doc rows, and
# the same comparison-based bucket CASE. sum(m) is HUGEINT in DuckDB and
# int64 on the Ray side — both exact on the same integers; the division
# result fits int64 because each m does.
_PPL_BUCKETS_SQL = (
    _VOCAB_CTE
    + _LM_MICRO_CTE
    + f""",
s AS (SELECT doc_id, CAST(sum(m) // count(*) AS BIGINT) AS lm_micro
      FROM t GROUP BY doc_id),
r AS (SELECT lm_micro, row_number() OVER (ORDER BY lm_micro) - 1 AS rk
      FROM s),
nn AS (SELECT count(*) AS n FROM s),
th AS (SELECT
    max(CASE WHEN r.rk = ((nn.n - 1) * {PPL_BUCKET_PCTS[0]}) // 100
        THEN r.lm_micro END) AS t33,
    max(CASE WHEN r.rk = ((nn.n - 1) * {PPL_BUCKET_PCTS[1]}) // 100
        THEN r.lm_micro END) AS t66
  FROM r, nn)
SELECT s.doc_id, s.lm_micro,
       CASE WHEN s.lm_micro <= th.t33 THEN 'head'
            WHEN s.lm_micro <= th.t66 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM s, th
"""
)

register("text_perplexity_buckets", q_perplexity_buckets, _PPL_BUCKETS_SQL)


# ---------------------------------------------------------------------------
# BM25 retrieval — the standard lexical search scorer, as a two-phase Ray
# DAG: (1) a tiny stats aggregate (per-term document frequency over the
# query terms + total token mass for avgdl), broadcast once; (2) a scoring
# scan where each block computes its docs' tf/dl fully vectorized
# (dictionary-encode + bincount — no per-row Python) and emits a LOCAL
# top-k partial, so the driver folds |blocks| x k rows, never the corpus.
# Scores are rounded to 6dp BEFORE ranking on both engines, making the
# (score desc, doc_id asc) order deterministic under float fold drift.
#
# 100-TB shape: phase 1 exchanges <= |terms|+1 combiner rows per block;
# phase 2 is shuffle-free (stats ride ray.put); result is top-k only.
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("hash", "vector", "spark")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _bm25_stats_partials(batch: pa.Table) -> pa.Table:
    """Per-block (term, df partial) over the query terms + one NUL-keyed
    row carrying the block's total token count (for avgdl)."""
    flat, parents = _words_flat(batch)
    terms, dfs = ["\x00tokens"], [int(len(parents))]
    if len(parents):
        d = pc.dictionary_encode(flat)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # O(|terms|) dictionary lookup, not an O(block vocab) Python dict
        tids = pc.index_in(
            pa.array(list(BM25_QUERY_TERMS)), value_set=d.dictionary
        ).to_numpy(zero_copy_only=False)
        for t, tid in zip(BM25_QUERY_TERMS, tids):
            if np.isnan(tid):
                continue
            docs = np.unique(parents[codes == int(tid)])
            if len(docs):
                terms.append(t)
                dfs.append(int(len(docs)))
    return pa.table(
        {"term": pa.array(terms, pa.string()),
         "df": pa.array(dfs, pa.int64())}
    )


def q_bm25_topk(sf_dir: str):
    """Top-k documents by BM25 over the fixed query terms. Output:
    (rank, doc_id, score) with score rounded to 6dp pre-ranking."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..parquet_stats import file_num_rows

    n_docs = file_num_rows(os.path.join(sf_dir, "documents.parquet"))
    stats = (
        _docs(sf_dir)
        .map_batches(_bm25_stats_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    if len(stats) == 0:  # zero-block dataset -> column-less empty frame
        import pandas as pd

        stats = pd.DataFrame({"term": [], "df": []})
    df_of = dict(zip(stats["term"], stats["df"]))
    total_tokens = int(df_of.pop("\x00tokens", 0))
    avgdl = total_tokens / n_docs if n_docs else 1.0
    idf_of = {
        t: float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
        for t, df in df_of.items()
    }
    stats_ref = ray.put((idf_of, avgdl))

    def score_block(batch: pa.Table) -> pa.Table:
        idf, ad = ray.get(stats_ref)
        flat, parents = _words_flat(batch)
        n = batch.num_rows
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
        if len(parents) == 0 or not idf:
            return empty
        dl = np.bincount(parents, minlength=n).astype(np.float64)
        d = pc.dictionary_encode(flat)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        qterms = sorted(idf)  # fixed fold order across runs
        tids = pc.index_in(
            pa.array(qterms), value_set=d.dictionary
        ).to_numpy(zero_copy_only=False)
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / ad)
        score = np.zeros(n, np.float64)
        for t, tid in zip(qterms, tids):
            if np.isnan(tid):
                continue
            w = idf[t]
            tf = np.bincount(parents[codes == int(tid)], minlength=n).astype(
                np.float64
            )
            score += np.where(
                tf > 0, w * tf * (BM25_K1 + 1.0) / (tf + norm), 0.0
            )
        keep = score > 0
        if not keep.any():
            return empty
        ids = (
            batch.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        sc = np.round(score[keep], 6)
        # local top-k partial: (score desc, doc_id asc)
        order = np.lexsort((ids, -sc))[:BM25_TOPK]
        return pa.table(
            {"doc_id": pa.array(ids[order], pa.int64()),
             "score": pa.array(sc[order], pa.float64())}
        )

    parts = (
        _docs(sf_dir)
        .map_batches(score_block, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    if len(parts) == 0:  # zero-block dataset -> column-less empty frame
        return pa.table(
            {"rank": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    parts = parts.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="stable"
    ).head(BM25_TOPK).reset_index(drop=True)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return pa.Table.from_pandas(
        parts[["rank", "doc_id", "score"]], preserve_index=False
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
_BM25_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                            x -> x != '')) AS token
  FROM documents),
nd AS (SELECT count(*) AS n FROM documents),
ad AS (SELECT (SELECT count(*) FROM w)
              / CAST((SELECT n FROM nd) AS DOUBLE) AS avgdl),
dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1),
tf AS (SELECT doc_id, token, count(*) AS tf FROM w
       WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM w
       WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         round(sum(
           ln(((SELECT n FROM nd) - df.df + 0.5) / (df.df + 0.5) + 1)
           * tf.tf * ({BM25_K1} + 1)
           / (tf.tf + {BM25_K1} * (1 - {BM25_B}
              + {BM25_B} * dl.dl / (SELECT avgdl FROM ad)))), 6) AS score
  FROM tf JOIN df ON tf.token = df.token
          JOIN dl ON tf.doc_id = dl.doc_id
  GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, score
FROM sc ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
"""

register("text_bm25_topk", q_bm25_topk, _BM25_SQL)


# ---------------------------------------------------------------------------
# unigram entropy — the information-theoretic quality signal (low entropy =
# repetitive/templated text; complements the repetition and gopher-rule
# filters). Shuffle-free: each doc's token histogram lives inside its block
# (one row per doc), so the whole op is one vectorized scan. The identity
# H = ln(n) - (1/n) * sum(c * ln c) needs ONE reduceat over the per-(doc,
# token) counts — no per-doc Python.
# ---------------------------------------------------------------------------


def q_unigram_entropy(sf_dir: str):
    """(doc_id, n_tokens, entropy): Shannon entropy (nats, 6dp) of each
    document's unigram distribution. Token-less (NULL/empty) docs have no
    distribution and are absent — mirroring SQL's empty GROUP BY."""

    def entropy_block(batch: pa.Table) -> pa.Table:
        flat, parents = _words_flat(batch)
        if len(parents) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "entropy": pa.array([], pa.float64())}
            )
        d = pc.dictionary_encode(flat)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = len(d.dictionary)
        key = parents.astype(np.int64) * nd + codes
        key.sort()
        first = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        cnt = np.diff(np.append(first, len(key))).astype(np.float64)
        docs = key[first] // nd  # sorted, one run per doc
        dfirst = np.flatnonzero(
            np.concatenate([[True], docs[1:] != docs[:-1]])
        )
        n = np.add.reduceat(cnt, dfirst)
        clogc = np.add.reduceat(cnt * np.log(cnt), dfirst)
        ent = np.round(np.log(n) - clogc / n, 6)
        ids = (
            batch.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)[docs[dfirst]]
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
             "entropy": pa.array(ent, pa.float64())}
        )

    df = (
        _docs(sf_dir)
        .map_batches(entropy_block, batch_format="pyarrow", **remote_kwargs())
        .to_pandas()
    )
    if len(df) == 0:  # zero-block dataset -> column-less empty frame
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64()),
             "entropy": pa.array([], pa.float64())}
        )
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "n_tokens", "entropy"]], preserve_index=False
    )


_ENTROPY_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '[ \t\n\r\x0b\x0c]+'),
                            x -> x != '')) AS token
  FROM documents),
c AS (SELECT doc_id, token, count(*) AS c FROM w GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
SELECT n.doc_id, n.n AS n_tokens,
       round(ln(n.n) - sum(c.c * ln(c.c)) / n.n, 6) AS entropy
FROM c JOIN n USING (doc_id)
GROUP BY 1, 2 ORDER BY 1
"""

register("text_unigram_entropy", q_unigram_entropy, _ENTROPY_SQL)


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence per source — the distribution-drift monitor
# (which sources' unigram distributions deviate from the corpus): the
# standard corpus-QA / domain-shift signal. Distributions live over the
# shared top-K vocabulary + one OOV cell (the text_lm_score vocab
# contract), so the cell space is bounded at K+1 regardless of corpus
# size. ONE (source, cell) combiner exchange; the driver folds
# |sources| x (K+1) rows (the source_mixture driver-fold precedent, x K+1
# — fine for catalog-scale source counts, not per-URL "sources").
# ---------------------------------------------------------------------------

_JSD_OOV = " oov "  # OOV cell label (contains spaces: collides with no
#: whitespace-split token, and stays a plain SQL string literal)


def _jsd_cell_partials(vocab_ref):
    def _fn(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import ray

        vocab, _, _ = ray.get(vocab_ref)
        flat, parents = _words_flat(batch)
        if len(parents) == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "cell": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        src = batch.column("source").to_numpy(zero_copy_only=False)
        src = np.where(pd.isna(src), "\x00", src.astype(object))[parents]
        pos = pc.index_in(flat, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        cell = np.where(
            np.isnan(pos),
            _JSD_OOV,
            np.asarray(vocab.to_pylist(), dtype=object)[
                np.nan_to_num(pos).astype(np.int64)
            ],
        )
        key = np.char.add(np.char.add(src.astype(str), "\x01"),
                          cell.astype(str))
        u, c = np.unique(key, return_counts=True)
        parts = np.char.partition(u, "\x01")
        return pa.table(
            {"source": pa.array(parts[:, 0].astype(object), pa.string()),
             "cell": pa.array(parts[:, 2].astype(object), pa.string()),
             "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    return _fn


def q_js_divergence_by_source(sf_dir: str):
    """(source, n_tokens, jsd): Jensen-Shannon divergence (nats, 6dp) of
    each source's unigram distribution from the whole-corpus distribution,
    over the top-K vocabulary + OOV cell."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    vocab, vcounts, total = corpus_vocab(sf_dir)
    if total == 0:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64()),
             "jsd": pa.array([], pa.float64())}
        )
    vocab_ref = ray.put((vocab, vcounts, total))
    df = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(_jsd_cell_partials(vocab_ref), batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["source", "cell"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64()),
             "jsd": pa.array([], pa.float64())}
        )
    cells = sorted(df["cell"].unique())
    cell_ix = {c: i for i, c in enumerate(cells)}
    # corpus distribution over the observed cells
    qcnt = np.zeros(len(cells))
    for c, n in df.groupby("cell")["n"].sum().items():
        qcnt[cell_ix[c]] = n
    qdist = qcnt / qcnt.sum()
    out_src, out_tok, out_jsd = [], [], []
    for src, grp in df.groupby("source", dropna=False):
        pcnt = np.zeros(len(cells))
        for c, n in zip(grp["cell"], grp["n"]):
            pcnt[cell_ix[c]] = n
        stot = pcnt.sum()
        pdist = pcnt / stot
        m = (pdist + qdist) / 2.0
        pm = pdist > 0
        qm = qdist > 0
        jsd = 0.5 * float(np.sum(pdist[pm] * np.log(pdist[pm] / m[pm]))) \
            + 0.5 * float(np.sum(qdist[qm] * np.log(qdist[qm] / m[qm])))
        out_src.append(None if src == "\x00" else src)
        out_tok.append(int(stot))
        out_jsd.append(round(jsd, 6))
    out = pd.DataFrame(
        {"source": out_src, "n_tokens": out_tok, "jsd": out_jsd}
    ).sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["source", "n_tokens", "jsd"]], preserve_index=False
    )


_JSD_SQL = (
    _VOCAB_CTE
    + f""",
w2 AS (
  SELECT source, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                                    x -> x != '')) AS token
  FROM documents),
sc AS (
  SELECT w2.source, coalesce(v.token, '{_JSD_OOV}') AS cell,
         count(*) AS n
  FROM w2 LEFT JOIN v ON w2.token = v.token
  GROUP BY 1, 2),
q AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n FROM sc GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM q),
stot AS (SELECT source, CAST(sum(n) AS BIGINT) AS st FROM sc GROUP BY 1),
grid AS (
  SELECT s.source, q.cell, q.n AS qn, coalesce(sc.n, 0) AS pn
  FROM (SELECT DISTINCT source FROM sc) s
  CROSS JOIN q
  LEFT JOIN sc ON sc.source IS NOT DISTINCT FROM s.source
              AND sc.cell = q.cell),
terms AS (
  SELECT g.source, stot.st,
         CASE WHEN g.pn > 0 THEN
           0.5 * (g.pn / CAST(stot.st AS DOUBLE))
               * ln((g.pn / CAST(stot.st AS DOUBLE))
                    / ((g.pn / CAST(stot.st AS DOUBLE)
                        + g.qn / CAST(tot.t AS DOUBLE)) / 2))
         ELSE 0 END
         + CASE WHEN g.qn > 0 THEN
           0.5 * (g.qn / CAST(tot.t AS DOUBLE))
               * ln((g.qn / CAST(tot.t AS DOUBLE))
                    / ((g.pn / CAST(stot.st AS DOUBLE)
                        + g.qn / CAST(tot.t AS DOUBLE)) / 2))
         ELSE 0 END AS term
  FROM grid g
  JOIN stot ON stot.source IS NOT DISTINCT FROM g.source
  CROSS JOIN tot)
SELECT source, max(st) AS n_tokens, round(sum(term), 6) AS jsd
FROM terms GROUP BY 1 ORDER BY 1
"""
)

register("text_js_divergence_by_source", q_js_divergence_by_source, _JSD_SQL)


# ---------------------------------------------------------------------------
# hashed-feature linear classifier inference — the quality-classifier shape
# (fastText/logreg-style filtering, e.g. CCNet/GPT-3-style page scoring) as
# a first-class ACTOR-POOL stage: the model (weight table) is built once per
# actor in __init__, scoring is vectorized per batch. Weights are derived
# arithmetically from the bucket index so the DuckDB mirror reproduces the
# exact same model — integer scores, no float drift.
# ---------------------------------------------------------------------------

HASH_CLS_DIM = 4096         # feature-hash buckets
HASH_CLS_MULT = 2654435761  # Knuth multiplicative constant
HASH_CLS_MOD = 2001         # weights span [-1000, 1000]


class HashedClassifier:
    """Actor-pool inference stage: hashed bag-of-words linear classifier.

    ``__init__`` (once per actor — the model-load pattern) materializes the
    HASH_CLS_DIM int64 weight table; ``__call__`` scores a batch with one
    dictionary-encode + gather + segment-sum. md5 is retained DELIBERATELY
    as the feature-hash contract (the mirror's substr(md5(token))) and is
    computed per DISTINCT token per batch with a per-actor memo — the
    bounded-vocabulary shape real tokenizer/embedding inference has."""

    def __init__(self):
        self.weights = (
            np.arange(HASH_CLS_DIM, dtype=np.int64) * HASH_CLS_MULT
        ) % HASH_CLS_MOD - HASH_CLS_MOD // 2
        self._bucket_memo: dict[str, int] = {}

    def _buckets(self, tokens: list[str]) -> np.ndarray:
        memo = self._bucket_memo
        out = np.empty(len(tokens), dtype=np.int64)
        for i, t in enumerate(tokens):
            b = memo.get(t)
            if b is None:
                b = int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % HASH_CLS_DIM
                memo[t] = b
            out[i] = b
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = _words_flat(batch)
        doc_tok = np.bincount(parents, minlength=batch.num_rows)
        has = doc_tok > 0  # token-less docs absent (SQL: no unnested rows)
        dict_arr = pc.dictionary_encode(flat)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        buckets = self._buckets(dict_arr.dictionary.to_pylist())
        tok_w = self.weights[
            buckets[dict_arr.indices.to_numpy(zero_copy_only=False)]
        ]
        offs = np.zeros(batch.num_rows + 1, dtype=np.int64)
        np.cumsum(doc_tok, out=offs[1:])
        sums = (
            np.add.reduceat(tok_w, offs[:-1][has])
            if has.any()
            else np.zeros(0, np.int64)
        )
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[has]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(sums, pa.int64()),
                "label": pa.array(
                    np.where(sums > 0, "keep", "drop"), pa.string()
                ),
            }
        )


def q_classifier_scores(sf_dir: str):
    return _docs(sf_dir).map_batches(
        HashedClassifier,
        batch_format="pyarrow",
        concurrency=(1, 4),
        **remote_kwargs(),
    )


_HASH_CLS_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\x0b\\x0c]+'),
                                    x -> x != '')) AS token
  FROM documents),
b AS (SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT)
               % {HASH_CLS_DIM} AS bucket
      FROM w)
SELECT doc_id,
       CAST(sum((bucket * {HASH_CLS_MULT}) % {HASH_CLS_MOD}
                - {HASH_CLS_MOD // 2}) AS BIGINT) AS score,
       CASE WHEN sum((bucket * {HASH_CLS_MULT}) % {HASH_CLS_MOD}
                     - {HASH_CLS_MOD // 2}) > 0
            THEN 'keep' ELSE 'drop' END AS label
FROM b GROUP BY 1
"""

register("text_classifier_scores", q_classifier_scores, _HASH_CLS_SQL)
