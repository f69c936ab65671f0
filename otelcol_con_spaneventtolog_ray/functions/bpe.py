"""BPE-style merge training over the corpus — the iterative-algorithm
pattern (like the IVF k-means trainer): each round is one distributed
pass that counts adjacent symbol pairs and the driver folds the exact
global top pair; the merge list is the only cross-round state and is
re-applied vectorized inside the next pass (stateless workers, no
materialized intermediate corpus).

Word-level BPE: symbols start as whitespace tokens, each learned merge
combines one adjacent pair into a single symbol, greedy LEFT-TO-RIGHT
non-overlapping within a run (the standard BPE application order),
vectorized via run-parity: in a run of consecutive candidate positions,
exactly the even-offset ones merge — no Python loop over symbols.

Merged symbols join with US (\\x1f), which cannot occur inside a token
(tokens are whitespace-split text), so symbol identity stays unambiguous
across rounds; the output table renders merges with spaces for
readability. Deterministic: ties in the pair count break by pair string
ascending. Rows-only for the driver gate (iterative, not
SQL-expressible); pytest pins the full merge list against a scalar
Python BPE mirror and the monotone non-increasing count property.

Scale notes: the per-round exchange is the salted (pair-hash partial
count) stream — identical shape to text_top_tokens; applying m merges in
round m+1 costs m vectorized passes over each batch (BPE_MERGES is
small). At 10^12 docs you'd train on a deterministic hash-sample of the
corpus (as real tokenizer training does); the sample bound is the only
change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .entry_queries import register
from ..rayenv import remote_kwargs

BPE_MERGES = 8
_SEP = "\x1f"


def _doc_symbols(batch: pa.Table):
    """Initial symbols = whitespace tokens: (object ndarray, offs, parents)."""
    from .textstats import _words_flat

    flat, parents = _words_flat(batch)
    syms = np.asarray(flat.to_pylist(), dtype=object)
    n = batch.num_rows
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(parents, minlength=n), out=offs[1:])
    return syms, offs


def _merge_once(syms: np.ndarray, offs: np.ndarray, left: str, right: str):
    """Apply ONE merge greedily left-to-right, vectorized.

    Candidates are positions i with (syms[i], syms[i+1]) == (left, right)
    and i, i+1 in the same doc. Greedy non-overlap: within each run of
    CONSECUTIVE candidate positions, keep the 0th, 2nd, 4th... (a kept
    merge at i consumes i+1, invalidating a candidate at i+1 — which
    re-validates i+2, exactly run parity)."""
    if len(syms) < 2:
        return syms, offs
    same_doc = np.repeat(
        np.arange(len(offs) - 1), np.diff(offs)
    )
    cand = np.flatnonzero(
        (syms[:-1] == left) & (syms[1:] == right)
        & (same_doc[:-1] == same_doc[1:])
    )
    if len(cand) == 0:
        return syms, offs
    # run parity over consecutive candidates
    run_start = np.concatenate([[True], np.diff(cand) != 1])
    run_ids = np.cumsum(run_start) - 1
    run_first = cand[np.flatnonzero(run_start)]
    keep = (cand - run_first[run_ids]) % 2 == 0
    merge_at = cand[keep]
    out = syms.copy()
    out[merge_at] = left + _SEP + right
    drop = np.zeros(len(syms), dtype=bool)
    drop[merge_at + 1] = True
    removed_per_doc = np.bincount(
        same_doc[merge_at + 1], minlength=len(offs) - 1
    )
    new_offs = offs - np.concatenate(
        [[0], np.cumsum(removed_per_doc)]
    ).astype(np.int64)
    return out[~drop], new_offs


def _pair_partials(merges: list[tuple[str, str]]):
    """Batch fn: apply the learned merges, then count adjacent pairs."""

    def count(batch: pa.Table) -> pa.Table:
        syms, offs = _doc_symbols(batch)
        for left, right in merges:
            syms, offs = _merge_once(syms, offs, left, right)
        if len(syms) < 2:
            return pa.table(
                {"left": pa.array([], pa.string()),
                 "right": pa.array([], pa.string())}
            )
        same_doc = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        ok = same_doc[:-1] == same_doc[1:]
        # one row per pair OCCURRENCE — counts_by's partial_counts_fn is
        # the per-batch combiner, so occurrence rows never hit the exchange
        return pa.table(
            {
                "left": pa.array(syms[:-1][ok], pa.string()),
                "right": pa.array(syms[1:][ok], pa.string()),
            }
        )

    return count


def _top_pair(sf_dir: str, merges: list[tuple[str, str]]):
    """One distributed pass -> the exact global top pair (n desc, pair asc)
    and its count, or None. Partial top-1 per block of the final counts is
    exact: each pair's total lives in exactly one post-groupby block."""
    from .dedup import _docs
    from ..stages.aggregate import counts_by

    counts = counts_by(
        _docs(sf_dir).map_batches(
            _pair_partials(merges), batch_format="pyarrow", **remote_kwargs()
        ),
        ["left", "right"],
    )

    def local_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "left", "right"], ascending=[False, True, True],
            kind="stable",
        ).head(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    tops = counts.map_batches(
        local_top, batch_format="pyarrow", **remote_kwargs()
    ).to_pandas()
    if len(tops) == 0:
        return None
    best = tops.sort_values(
        ["n", "left", "right"], ascending=[False, True, True], kind="stable"
    ).iloc[0]
    return str(best["left"]), str(best["right"]), int(best["n"])


def q_bpe_merges(sf_dir: str):
    """(step, merged, n): the first BPE_MERGES learned merges. `merged`
    renders the combined symbol with spaces between original tokens."""
    merges: list[tuple[str, str]] = []
    rows = []
    for step in range(1, BPE_MERGES + 1):
        top = _top_pair(sf_dir, merges)
        if top is None or top[2] < 2:
            break
        left, right, n = top
        merges.append((left, right))
        rows.append(
            {
                "step": step,
                "merged": (left + _SEP + right).replace(_SEP, " "),
                "n": n,
            }
        )
    if not rows:
        return pa.table(
            {"step": pa.array([], pa.int64()),
             "merged": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def _bpe_merges_sql() -> str:
    """Exact DuckDB mirror of q_bpe_merges (SQL-gated since round 5).

    The BPE loop is bounded (BPE_MERGES = 8), so the "iterative, not
    SQL-expressible" verdict was too pessimistic: unroll the 8 rounds as
    CTE stages. Each round re-derives per-doc symbol lists, counts adjacent
    pairs, picks the global top by (n DESC, left, right) — DuckDB's binary
    VARCHAR ordering == Python's codepoint ordering — and applies the merge
    greedily left-to-right via gaps-and-islands run parity (a maximal run
    of consecutive candidate positions merges at even offsets only),
    mirroring _merge_once. The break condition (top count < 2) propagates
    structurally: an empty top CTE cross-joins the state empty, so every
    later round yields no rows, exactly like the Python break.
    """
    steps = []
    outs = []
    for i in range(1, BPE_MERGES + 1):
        p = f"s{i}"
        steps.append(f"""ex{i} AS MATERIALIZED (
  SELECT doc_id, unnest(syms) AS s, unnest(range(1, len(syms) + 1)) AS pos
  FROM st{i - 1}),
pr{i} AS MATERIALIZED (
  SELECT doc_id, pos, s,
         lead(s) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM ex{i}),
tp{i} AS MATERIALIZED (
  SELECT s AS l, nxt AS r, count(*) AS n
  FROM pr{i} WHERE nxt IS NOT NULL
  GROUP BY s, nxt HAVING count(*) >= 2
  ORDER BY n DESC, l, r LIMIT 1),
cnd{i} AS MATERIALIZED (
  SELECT p.doc_id, p.pos, p.s, t.l, t.r,
         (p.s = t.l AND p.nxt = t.r) AS cand
  FROM pr{i} p CROSS JOIN tp{i} t),
mat{i} AS MATERIALIZED (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, min(pos) OVER (PARTITION BY doc_id, grp) AS rf
    FROM (SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM cnd{i} WHERE cand))
  WHERE (pos - rf) % 2 = 0),
st{i} AS MATERIALIZED (
  SELECT c.doc_id,
         list(CASE WHEN m.pos IS NOT NULL THEN c.l || chr(31) || c.r
                   ELSE c.s END ORDER BY c.pos) AS syms
  FROM cnd{i} c
  LEFT JOIN mat{i} m ON m.doc_id = c.doc_id AND m.pos = c.pos
  LEFT JOIN mat{i} d ON d.doc_id = c.doc_id AND d.pos = c.pos - 1
  WHERE d.pos IS NULL
  GROUP BY c.doc_id)""")
        outs.append(
            f"SELECT {i}::BIGINT AS step, "
            f"replace(l || chr(31) || r, chr(31), ' ') AS merged, n FROM tp{i}"
        )
    body = ",\n".join(steps)
    union = "\nUNION ALL\n".join(outs)
    return f"""
WITH
st0 AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '[ \\t\\n\\r\\x0b\\x0c]+'),
                     x -> x <> '') AS syms
  FROM documents),
{body}
SELECT step, merged, n FROM ({union}) ORDER BY step
"""


# SQL-gated since round 5: the bounded merge loop is unrolled into an
# 8-stage DuckDB mirror (see _bpe_merges_sql).
register("text_bpe_merges", q_bpe_merges, _bpe_merges_sql())
