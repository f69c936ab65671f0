"""Corpus-level duplicate-line removal (CCNet/RefinedWeb-style boilerplate
pruning): a non-empty line that occurs in >= LINE_DUP_MIN_DOCS documents is
boilerplate (nav bars, cookie banners, footers) and is removed from every
document; the cleaned text is the kept lines re-joined.

Scale shape (two passes, one small shuffle, one broadcast):

1. Count pass — per batch, split each doc on ``\\n``, drop empty lines,
   128-bit-hash every DISTINCT line per doc (``batch_content_hash`` over the
   flattened line column), and pre-aggregate to (h1, h2, cnt) partials
   WITHIN the batch, so only distinct line hashes x blocks ever reach the
   ``groupby`` — never a row per line occurrence, never a line string.
2. The common set (count >= threshold) is tiny in practice (boilerplate is
   by definition repeated); it is bounded by LINE_BROADCAST_MAX with a
   fail-fast, materialized once, and broadcast via ``ray.put`` as lexsorted
   (h1, h2) arrays.
3. Clean pass — membership by h1-range searchsorted + h2 compare (the same
   lo/hi pattern as corpus._exact_drop_flags), then the kept lines are
   re-joined per doc with ONE ``binary_join`` over a rebuilt list array.

The driver's synthetic documents are single-line (no ``\\n``), so at the
gate this degenerates to whole-document dedup-marking — the full DAG still
runs and hashes; multi-line corpora with planted boilerplate are exercised
in pytest. 128-bit hashing (not 64) because the corpus-wide distinct-line
count at 10^12 docs (~1e10+) makes 64-bit birthday collisions likely, and a
false member silently deletes a unique line.

SQL mirror: exact line STRINGS (DuckDB groups the strings themselves); a
divergence from the Ray side needs a 128-bit content-hash collision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entry_queries import register
from .texthash import batch_content_hash
from ..rayenv import remote_kwargs

#: a non-empty line in at least this many documents is boilerplate
LINE_DUP_MIN_DOCS = 2
#: fail-fast bound on the broadcast common-line set (5M x 16 B = 80 MB).
#: A corpus whose *repeated-line* vocabulary exceeds this is not a
#: boilerplate problem — rerun with a higher threshold.
LINE_BROADCAST_MAX = 5_000_000


def _doc_lines(batch: pa.Table):
    """Split text on newline, drop empty lines. Returns (flat lines array,
    per-line parent doc index, per-doc non-empty line counts)."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ls = pc.split_pattern(text, pattern="\n")
    if isinstance(ls, pa.ChunkedArray):
        ls = ls.combine_chunks()
    flat = ls.flatten()
    # NULL text -> null list -> NaN length: zero it (parity-fuzz regression)
    parents = np.repeat(
        np.arange(batch.num_rows, dtype=np.int64),
        np.nan_to_num(
            pc.list_value_length(ls)
            .to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64),
    )
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    flat = flat.filter(pa.array(keep))
    parents = parents[keep]
    counts = np.bincount(parents, minlength=batch.num_rows)
    return flat, parents, counts


def line_count_partials(batch: pa.Table) -> pa.Table:
    """(h1, h2, cnt) doc-count partials for every distinct non-empty line in
    the batch — distinct per doc first (a doc repeating its own line counts
    once), then folded across the batch's docs."""
    flat, parents, _ = _doc_lines(batch)
    empty = pa.table(
        {"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64()),
         "cnt": pa.array([], pa.int64())}
    )
    if len(flat) == 0:
        return empty
    h1, h2 = batch_content_hash(flat)
    # distinct (doc, line-hash): lexsort then boundary-compare
    order = np.lexsort((h2, h1, parents))
    p, a, b = parents[order], h1[order], h2[order]
    first = np.concatenate(
        [[True], (p[1:] != p[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    )
    a, b = a[first], b[first]
    # fold across docs: count per distinct (h1, h2)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    starts = np.flatnonzero(first)
    cnt = np.diff(np.append(starts, len(a)))
    return pa.table(
        {
            "h1": pa.array(a[starts].view(np.int64), pa.int64()),
            "h2": pa.array(b[starts].view(np.int64), pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def common_line_hashes(sf_dir: str):
    """Lexsorted (h1, h2) uint64 arrays of lines in >= LINE_DUP_MIN_DOCS
    docs. Small by construction; fail-fast at LINE_BROADCAST_MAX."""
    from .dedup import _docs

    def over(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t.column("sum(cnt)"), LINE_DUP_MIN_DOCS)
        return t.filter(mask).select(["h1", "h2"])

    common = (
        _docs(sf_dir)
        .map_batches(line_count_partials, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby(["h1", "h2"])
        .sum("cnt")
        .map_batches(over, batch_format="pyarrow", **remote_kwargs())
        .materialize()
    )
    n = common.count()
    if n > LINE_BROADCAST_MAX:
        raise ValueError(
            f"common-line set has {n} entries (cap {LINE_BROADCAST_MAX}):"
            " this corpus's repeated-line vocabulary is too large to"
            " broadcast — raise lines.LINE_DUP_MIN_DOCS (more selective"
            " boilerplate) or lines.LINE_BROADCAST_MAX deliberately."
        )
    if n == 0:  # empty datasets lose their schema through to_pandas
        z = np.zeros(0, dtype=np.uint64)
        return z, z
    df = common.to_pandas()
    h1 = df["h1"].to_numpy().astype(np.int64).view(np.uint64)
    h2 = df["h2"].to_numpy().astype(np.int64).view(np.uint64)
    order = np.lexsort((h2, h1))
    return h1[order], h2[order]


def _member_mask(h1, h2, c1, c2) -> np.ndarray:
    """membership of (h1, h2) rows in the lexsorted common set (c1, c2):
    h1-range via two searchsorteds, then h2 compare inside the (almost
    always length-<=1) range."""
    out = np.zeros(len(h1), dtype=bool)
    if len(c1) == 0 or len(h1) == 0:
        return out
    lo = np.searchsorted(c1, h1, side="left")
    hi = np.searchsorted(c1, h1, side="right")
    one = hi - lo == 1  # the common case: unique h1 in the set
    li = lo[one]
    sub = np.flatnonzero(one)
    out[sub] = c2[li] == h2[one]
    for i in np.flatnonzero(hi - lo > 1):  # h1 collision inside the set
        rng = np.arange(lo[i], hi[i])
        out[i] = bool((c2[rng] == h2[i]).any())
    return out


def make_line_clean_fn(common_ref):
    """Clean-pass closure: remove common lines, rebuild text_clean."""
    import ray

    def clean(batch: pa.Table) -> pa.Table:
        c1, c2 = ray.get(common_ref)
        flat, parents, counts = _doc_lines(batch)
        n = batch.num_rows
        if len(flat):
            h1, h2 = batch_content_hash(flat)
            drop = _member_mask(h1, h2, c1, c2)
        else:
            drop = np.zeros(0, dtype=bool)
        keep = ~drop
        kept_counts = (
            np.bincount(parents[keep], minlength=n) if len(flat)
            else np.zeros(n, dtype=np.int64)
        )
        kept_lines = flat.filter(pa.array(keep))
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=offs[1:])
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_lines)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_lines": pa.array(counts.astype(np.int64), pa.int64()),
                "n_kept": pa.array(kept_counts.astype(np.int64), pa.int64()),
                "text_clean": pc.binary_join(lst, "\n"),
            }
        )

    return clean


def q_line_dedup(sf_dir: str):
    """(doc_id, n_lines, n_kept, text_clean): corpus-level duplicate-line
    removal. Lines in >= LINE_DUP_MIN_DOCS docs are removed everywhere;
    empty lines are always dropped (normalization)."""
    import ray

    from .dedup import _docs

    common_ref = ray.put(common_line_hashes(sf_dir))
    return _docs(sf_dir).map_batches(
        make_line_clean_fn(common_ref), batch_format="pyarrow",
        **remote_kwargs()
    )


# coalesce(text, '') — NULL text has zero lines like the Ray side, not a
# NULL list that turns every count NULL (parity-fuzz finding)
_LINE_DEDUP_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), chr(10)),
                     x -> x != '') AS ls
  FROM documents),
d AS (SELECT DISTINCT doc_id, unnest(ls) AS line FROM s),
c AS (SELECT line FROM d GROUP BY 1 HAVING count(*) >= {LINE_DUP_MIN_DOCS}),
arr AS (SELECT coalesce(list(line), CAST([] AS VARCHAR[])) AS a FROM c)
SELECT doc_id, len(ls) AS n_lines,
       len(list_filter(ls, x -> NOT list_contains(arr.a, x))) AS n_kept,
       coalesce(array_to_string(
         list_filter(ls, x -> NOT list_contains(arr.a, x)), chr(10)), '')
         AS text_clean
FROM s, arr
"""


register("text_line_dedup", q_line_dedup, _LINE_DEDUP_SQL)
