"""Vectorized text-hashing primitives shared by the dedup operators.

Everything here is numpy-over-Arrow-buffers — no Python loop ever touches a
word or a document in the batch paths:

* :func:`batch_words` — ASCII-whitespace tokenizer over a string column's raw
  byte buffer (word boundaries from a 256-entry lookup table + boundary
  breaks at document edges), returning one uint64 hash per word plus the
  word->document segmentation. Whitespace class is pinned to RE2 ``\\s``
  (``[\\t\\n\\f\\r\\v ]``) — see textstats._WS_RE for why.
* :func:`prefix_hash` — polynomial rolling-hash prefixes over a uint64
  sequence with O(1) window evaluation (mod 2^64; the base is odd so its
  modular inverse exists and the prefix is a cumprod+cumsum, not a serial
  scan). The same trick rolling_fingerprint_batch uses over bytes, hoisted
  to arbitrary uint64 sequences so word k-gram (shingle) hashes come from
  the WORD-hash sequence in O(1) per shingle.

Scalar mirrors (:func:`word_hash_scalar`, ...) reproduce the exact same
values one token at a time; the dedup property tests pin batch==scalar so
the vectorized kernels can't drift.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public-domain splitmix64 constants)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

BYTE_BASE = np.uint64(1000003)        # byte-level polynomial base (odd)
WORD_BASE = np.uint64(0x100000001B3)  # word-level polynomial base (FNV prime)
U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

#: ASCII whitespace bytes == RE2 '\s'; multi-byte UTF-8 never contains these
#: byte values (continuation bytes are >= 0x80), so byte-level scanning is
#: exact for arbitrary UTF-8 text.
_WS_BYTES = (9, 10, 11, 12, 13, 32)
_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[list(_WS_BYTES)] = True

ASCII_WS_RE = re.compile(r"\s+", re.ASCII)


def _string_buffer_view(col: pa.Array | pa.ChunkedArray):
    """(offsets:int64[n+1], data:uint8) raw view of a (large_)string or
    (large_)binary column's buffers. Shared by every buffer-level kernel
    (tokenizer, media stages) so the null-data-buffer guard and offset
    handling live in exactly one place."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    off_dtype = (
        np.int64
        if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type)
        else np.int32
    )
    offsets = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.zeros(0, np.uint8)
    return offsets, data


def prefix_hash(vals: np.ndarray, base: np.uint64):
    """(prefix, pw) such that the hash of vals[lo:hi] is
    ``prefix[hi] - prefix[lo] * pw[hi - lo]`` (uint64 wraparound math).

    prefix[i] = sum_{j<i} vals[j] * base^(i-1-j) mod 2^64, i.e. the value of
    the left-to-right fold ``h = h*base + v`` — computed without a serial
    scan via cumsum of vals[j] * base^-j then scaling by base^(i-1).
    """
    L = len(vals)
    # exactly three L-sized allocations, everything else in place — big
    # first-touch allocations page-fault slowly on this box, so temporaries
    # cost more than the arithmetic
    with np.errstate(over="ignore"):
        pw = np.full(L + 1, base, dtype=np.uint64)
        pw[0] = 1
        np.cumprod(pw, out=pw)
        prefix = np.empty(L + 1, dtype=np.uint64)
        prefix[0] = 0
        if L:
            inv = np.uint64(pow(int(base), -1, 1 << 64))
            ipw = np.full(L, inv, dtype=np.uint64)
            ipw[0] = 1
            np.cumprod(ipw, out=ipw)
            np.multiply(ipw, vals, out=ipw, casting="unsafe")  # v_j * B^-j
            np.cumsum(ipw, out=ipw)
            np.multiply(pw[:L], ipw, out=prefix[1:])
    return prefix, pw


def window_hash(prefix: np.ndarray, pw: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Vectorized O(1) polynomial hash of vals[lo:hi) from prefix_hash output."""
    with np.errstate(over="ignore"):
        return prefix[hi] - prefix[lo] * pw[hi - lo]


#: second byte-level base for the 128-bit content hash (odd => invertible)
BYTE_BASE2 = np.uint64(1000000007)


def batch_content_hash(text: pa.Array | pa.ChunkedArray):
    """Two independent 64-bit content hashes per row -> (h1, h2) uint64.

    Each is a polynomial fold over the row's raw UTF-8 bytes with a leading
    1-sentinel (h = fold(1 || bytes), i.e. raw + base^len — so a leading NUL
    byte cannot alias a shorter string), splitmix64-finalized. Fully
    vectorized via prefix_hash over the column's single data buffer; the two
    bases are independent, giving ~128 bits against collisions (birthday
    bound ~2^64 documents). Scalar mirror: :func:`content_hash_scalar`.
    """
    offsets, data = _string_buffer_view(text)
    lo_all = offsets[0]
    view = data[lo_all:offsets[-1]]
    lo = offsets[:-1] - lo_all
    hi = offsets[1:] - lo_all
    out = []
    for base in (BYTE_BASE, BYTE_BASE2):
        prefix, pw = prefix_hash(view, base)
        with np.errstate(over="ignore"):
            raw = window_hash(prefix, pw, lo, hi) + pw[hi - lo]
        out.append(_splitmix64(raw))
    return out[0], out[1]


def batch_words(text: pa.Array | pa.ChunkedArray):
    """Tokenize a string column into hashed words, fully vectorized.

    Returns ``(word_hashes:uint64[w], parents:int64[w], word_offs:int64[n+1])``
    where ``parents[i]`` is the row index of word i (nondecreasing) and
    ``word_offs`` segments the word arrays per document. A word's hash is
    ``splitmix64(polyfold_{BYTE_BASE}(word bytes))``.
    """
    offsets, data = _string_buffer_view(text)
    n = len(offsets) - 1
    lo_all, hi_all = offsets[0], offsets[-1]
    view = data[lo_all:hi_all]
    L = len(view)
    if L == 0:
        return (
            np.zeros(0, dtype=np.uint64),
            np.zeros(0, dtype=np.int64),
            np.zeros(n + 1, dtype=np.int64),
        )
    nonws = ~_WS_LUT[view]
    doc_starts = offsets[:-1] - lo_all
    doc_ends = offsets[1:] - lo_all
    prev = np.empty(L, dtype=bool)
    prev[0] = False
    prev[1:] = nonws[:-1]
    prev[doc_starts[doc_starts < L]] = False  # words never span documents
    nxt = np.empty(L, dtype=bool)
    nxt[-1] = False
    nxt[:-1] = nonws[1:]
    e = doc_ends - 1
    nxt[e[(e >= 0) & (e < L)]] = False
    starts = np.flatnonzero(nonws & ~prev)
    ends = np.flatnonzero(nonws & ~nxt) + 1
    parents = np.searchsorted(doc_ends, starts, side="right").astype(np.int64)
    prefix, pw = prefix_hash(view, BYTE_BASE)
    word_hashes = _splitmix64(window_hash(prefix, pw, starts, ends))
    counts = np.bincount(parents, minlength=n)
    word_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=word_offs[1:])
    return word_hashes, parents, word_offs


def batch_shingles(word_hashes: np.ndarray, word_offs: np.ndarray, k: int):
    """Word k-gram (shingle) hashes per document, vectorized.

    Documents with >= k words contribute one shingle per window of k words;
    shorter non-empty documents contribute ONE shingle over all their words;
    empty documents contribute none. Returns ``(shingles:uint64[s],
    parents:int64[s])`` with parents nondecreasing.
    """
    W = len(word_hashes)
    n = len(word_offs) - 1
    prefix, pw = prefix_hash(word_hashes, WORD_BASE)
    counts = np.diff(word_offs)
    out_sh, out_par = [], []
    long_m = counts >= k
    if long_m.any() and W >= k:
        cand = np.arange(W - k + 1, dtype=np.int64)
        par = np.searchsorted(word_offs[1:], cand, side="right").astype(np.int64)
        ok = cand + k <= word_offs[par + 1]
        s, p = cand[ok], par[ok]
        out_sh.append(window_hash(prefix, pw, s, s + k))
        out_par.append(p)
    short_m = (counts > 0) & (counts < k)
    if short_m.any():
        d = np.flatnonzero(short_m)
        out_sh.append(window_hash(prefix, pw, word_offs[d], word_offs[d + 1]))
        out_par.append(d.astype(np.int64))
    if not out_sh:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    sh = np.concatenate(out_sh)
    par = np.concatenate(out_par)
    order = np.argsort(par, kind="stable")
    return _splitmix64(sh[order]), par[order]


# ---------------------------------------------------------------------------
# scalar mirrors — test oracles for the batch kernels, one value at a time
# ---------------------------------------------------------------------------

def _splitmix64_scalar(x: int) -> int:
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def word_hash_scalar(word: str) -> int:
    h = 0
    for b in word.encode("utf-8"):
        h = (h * int(BYTE_BASE) + b) & ((1 << 64) - 1)
    return _splitmix64_scalar(h)


def shingle_hash_scalar(word_hashes: list[int]) -> int:
    h = 0
    for w in word_hashes:
        h = (h * int(WORD_BASE) + w) & ((1 << 64) - 1)
    return _splitmix64_scalar(h)


def words_scalar(text: str) -> list[str]:
    return [w for w in ASCII_WS_RE.split(text) if w]


def content_hash_scalar(text: str) -> tuple[int, int]:
    """Scalar mirror of :func:`batch_content_hash` for one string."""
    M = (1 << 64) - 1
    bs = text.encode("utf-8")
    out = []
    for base in (int(BYTE_BASE), int(BYTE_BASE2)):
        h = 1  # leading sentinel: fold(1 || bytes)
        for b in bs:
            h = (h * base + b) & M
        out.append(_splitmix64_scalar(h))
    return out[0], out[1]
