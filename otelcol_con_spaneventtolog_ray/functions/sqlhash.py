"""DuckDB SQL mirrors of the 64-bit text-hash kernels (texthash.py).

These build ANSI-SQL strings that reproduce the numpy hash pipeline
EXACTLY — integer-for-integer — so hash-based operators (MinHash banding)
can be driver-gated against a DuckDB oracle instead of rows-only checks.

Why this is exact (not approximate):

* every value is carried as HUGEINT (signed 128-bit) in [0, 2^64) with an
  explicit ``% 2^64`` after each step, mirroring uint64 wraparound;
* polynomial folds ``h = h*BASE + v`` multiply a < 2^64 value by a < 2^41
  base, so the product fits HUGEINT directly (< 2^105);
* splitmix64's two 64-bit x 64-bit multiplies are the only products that
  could overflow HUGEINT, so they are computed via the 32-bit split
  ``(a*c) mod 2^64 = (a0*c + ((a1*(c mod 2^32)) mod 2^32)*2^32) mod 2^64``
  (a0/a1 the low/high 32-bit halves of a) — every intermediate < 2^97;
* word tokenization uses ``string_split_regex`` with the explicit
  ``[ \\t\\n\\r\\x0b\\x0c]+`` class — byte-for-byte the ASCII-whitespace
  class the vectorized tokenizer pins (texthash._WS_BYTES; RE2's ``\\s``
  would silently exclude ``\\x0b``);
* word bytes are recovered from ``hex(encode(word))`` so arbitrary UTF-8
  (and arbitrary bytes) hash identically to the numpy byte-buffer fold.

The mirrors are O(total bytes x 1) + O(distinct shingles x 64) inside
DuckDB — fine at gate scale (sf0.01 runs in ~5 s), irrelevant at 100 TB
(oracles exist only for the correctness gate).
"""

from __future__ import annotations

M64 = 1 << 64
#: splitmix64 public-domain constants (texthash._splitmix64)
SM_C0 = 0x9E3779B97F4A7C15
SM_C1 = 0xBF58476D1CE4E5B9
SM_C2 = 0x94D049BB133111EB


def splitmix64_int(x: int) -> int:
    """Python scalar splitmix64 — used to inline seed literals into SQL."""
    z = (x + SM_C0) % M64
    z = ((z ^ (z >> 30)) * SM_C1) % M64
    z = ((z ^ (z >> 27)) * SM_C2) % M64
    return z ^ (z >> 31)


def mulmod_sql(a_expr: str, c: int) -> str:
    """SQL for ``(a * c) mod 2^64`` with column expr `a` in [0, 2^64) and
    uint64 constant `c`, via the 32-bit split (see module docstring)."""
    return (
        f"((({a_expr}) % 4294967296) * {c}::HUGEINT "
        f"+ (((({a_expr}) // 4294967296) * {c % (1 << 32)}::HUGEINT) "
        f"% 4294967296) * 4294967296) % {M64}::HUGEINT"
    )


def splitmix64_ctes(
    prefix: str, src: str, carry: list[str], x_expr: str, out_col: str
) -> tuple[str, str]:
    """CTE chain computing ``out_col = splitmix64(x_expr)`` over CTE `src`,
    carrying `carry` columns through. One step per CTE keeps every column
    reference linear (a single nested expression would duplicate the input
    subtree 2^6 times). Returns (sql_fragment, last_cte_name)."""
    cols = ", ".join(carry)
    steps = [
        f"(({x_expr}) + {SM_C0}::HUGEINT) % {M64}::HUGEINT",
        "xor({z}, {z} >> 30)",
        mulmod_sql("{z}", SM_C1),
        "xor({z}, {z} >> 27)",
        mulmod_sql("{z}", SM_C2),
        "xor({z}, {z} >> 31)",
    ]
    frags, prev = [], src
    for i, step in enumerate(steps):
        cte = f"{prefix}{i}"
        col = out_col if i == len(steps) - 1 else f"z{i}"
        expr = step.format(z=f"z{i - 1}") if i else step
        frags.append(f"{cte} AS (SELECT {cols}, {expr} AS {col} FROM {prev})")
        prev = cte
    return ",\n".join(frags), prev


def word_hash_ctes(byte_base: int) -> tuple[str, str]:
    """CTE chain ``documents -> wh5(doc_id, widx, c, wh)``: one row per
    word with its texthash.word_hash value (splitmix64 of the byte-level
    polynomial fold), widx 1-based, c = words in the doc. Word-less (empty /
    NULL-text) documents produce no rows — matching minhash_bands_batch's
    explicit drop."""
    frag = f"""words AS (
  SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws) + 1)) AS widx,
         len(ws) AS c
  FROM (SELECT doc_id,
               list_filter(string_split_regex(coalesce(text, ''), '[ \\t\\n\\r\\x0b\\x0c]+'),
                           x -> x <> '') AS ws
        FROM documents)
  WHERE len(ws) > 0),
wchars AS (
  SELECT doc_id, widx, c, hex(encode(word)) AS hx,
         octet_length(encode(word)) AS L
  FROM words),
powers AS (
  SELECT 0 AS k, 1::HUGEINT AS pw
  UNION ALL
  SELECT k + 1, (pw * {byte_base}::HUGEINT) % {M64}::HUGEINT FROM powers
  WHERE k < (SELECT coalesce(max(L), 0) FROM wchars)),
wbytes AS (
  SELECT doc_id, widx, c, L, unnest(range(1, L + 1)) AS bi, hx
  FROM wchars),
word_fold AS (
  SELECT doc_id, widx, c,
         COALESCE(SUM((((strpos('0123456789ABCDEF', substring(hx, 2*bi - 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substring(hx, 2*bi, 1)) - 1)::HUGEINT
               * pw) % {M64}::HUGEINT), 0::HUGEINT) % {M64}::HUGEINT AS fold
  FROM wbytes JOIN powers ON powers.k = wbytes.L - wbytes.bi
  GROUP BY doc_id, widx, c)"""
    sm, last = splitmix64_ctes("wh", "word_fold", ["doc_id", "widx", "c"], "fold", "wh")
    return frag + ",\n" + sm, last


def hexbyte_sql(hx: str, pos: str) -> str:
    """SQL for the 0-based byte at position `pos` of the hex dump `hx`
    (as produced by hex(encode(...))) — the byte-recovery idiom the
    word-fold and rolling-fingerprint mirrors use, factored for reuse."""
    return (
        f"((strpos('0123456789ABCDEF', substring({hx}, 2*({pos}) + 1, 1)) - 1) * 16"
        f" + strpos('0123456789ABCDEF', substring({hx}, 2*({pos}) + 2, 1)) - 1)"
    )


def uint64_to_int64_sql(expr: str) -> str:
    """Two's-complement reinterpretation, mirroring numpy .view(int64)."""
    return (
        f"CASE WHEN ({expr}) >= 9223372036854775808::HUGEINT "
        f"THEN (({expr}) - {M64}::HUGEINT)::BIGINT ELSE ({expr})::BIGINT END"
    )
