"""Scale-stress for the final-session ops (perplexity buckets, cross-source
overlap, token-budget selection): deterministic replications of sf0.1
documents to 100k and 1M rows under /tmp. Each replica offsets doc_id and
prepends a replica-pool word so distinct texts/grams grow with the data
while the vocabulary (and therefore the micro-nat / quality distribution
cells) stays bounded — the regime the two-phase folds are designed for.

Usage: python tools/stress_newops.py [--cpus 32] [--docs 100000 ...]
Prints one JSON line {op@rows: wall_sec} for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = "/tmp/graft_stress_newops"

#: bounded tag pool: grows gram diversity without unbounding the vocab
TAGS = [f"tag{i:02d}" for i in range(100)]


def build_docs(n_docs: int) -> str:
    d = os.path.join(OUT, f"docs{n_docs}")
    marker = os.path.join(d, ".done")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    parts = os.path.join(d, "documents.parquet")
    os.makedirs(parts)
    t = pq.read_table(SF + "/documents.parquet")
    base = t.num_rows
    if n_docs % base:
        raise SystemExit(
            f"--docs must be a multiple of the sf0.1 base ({base}); "
            f"got {n_docs}"
        )
    reps = n_docs // base
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    texts = t.column("text").to_pylist()
    for r in range(reps):
        tag = TAGS[r % len(TAGS)]
        t2 = pa.table(
            {
                "doc_id": pa.array(ids + r * base, pa.int64()),
                "text": pa.array(
                    [f"{tag} {x}" if x is not None else None for x in texts],
                    pa.string(),
                ),
                "lang": t.column("lang"),
                "source": t.column("source"),
                "n_chars": t.column("n_chars"),
            }
        )
        pq.write_table(t2, os.path.join(parts, f"part-{r:04d}.parquet"))
    open(marker, "w").close()
    return d


def build_embeddings(n_vecs: int) -> str:
    """Replicated sf0.1 embeddings (2000 x 64f): replica r offsets vec_id by
    r*base and perturbs each vector with seeded unit noise at eps=0.05, so
    every base vector becomes a clique of ~n/2000 semantic near-dups
    (cos ~0.9988) — the heavy-dedup regime SemDeDup exists for."""
    import numpy as np

    d = os.path.join(OUT, f"emb{n_vecs}")
    marker = os.path.join(d, ".done")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    parts = os.path.join(d, "embeddings.parquet")
    os.makedirs(parts)
    t = pq.read_table(SF + "/embeddings.parquet")
    base = t.num_rows
    if n_vecs % base:
        raise SystemExit(f"--vecs must be a multiple of {base}")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    emb = t.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    mat = emb.flatten().to_numpy(zero_copy_only=False).reshape(base, -1)
    for r in range(n_vecs // base):
        rng = np.random.default_rng(r)
        noise = rng.standard_normal(mat.shape)
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        pert = mat + 0.05 * noise * np.linalg.norm(mat, axis=1,
                                                   keepdims=True)
        t2 = pa.table(
            {
                "vec_id": pa.array(ids + r * base, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in pert.astype(np.float32)],
                    pa.list_(pa.float32()),
                ),
                "label": t.column("label"),
            }
        )
        pq.write_table(t2, os.path.join(parts, f"part-{r:04d}.parquet"))
    open(marker, "w").close()
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--docs", type=int, nargs="*",
                    default=[100_000, 1_000_000])
    ap.add_argument("--vecs", type=int, nargs="*",
                    default=[200_000, 1_000_000])
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)
    import __ray_entry__ as e

    qs = e.queries()
    walls: dict[str, float] = {}
    for n in args.docs:
        sf = build_docs(n)
        for name in ("text_perplexity_buckets", "corpus_source_overlap",
                     "corpus_token_budget",
                     # round-4 continuation ops
                     "web_url_dedup", "corpus_epoch_shuffle",
                     "text_decontaminate_fuzzy",
                     # closing-session ops (documents-only inputs)
                     "web_domain_stats", "web_pagerank", "text_bm25_topk",
                     "corpus_temperature_mixture", "text_unigram_entropy", "web_crawl_frontier",
                     "text_js_divergence_by_source",
                     "dedup_incremental", "multimodal_phash",
                     "text_classifier_scores", "corpus_dsir_weights",
                     "web_hits", "web_components"):
            t0 = time.monotonic()
            out = qs[name](sf)
            df = out.to_pandas() if hasattr(out, "to_pandas") else out
            walls[f"{name}@{n}"] = round(time.monotonic() - t0, 2)
            walls[f"{name}@{n}_rows"] = len(df)
    # phash near-dups at 100k only: the replica corpus is a deliberate
    # heavy-dup regime (every base doc -> a ~reps-size clique, pair count
    # grows as reps^2), so the 1M run would stress the PAIR OUTPUT, not the
    # banding — same reason the exact-Jaccard baseline is doc-capped
    n0 = min(args.docs) if args.docs else 0
    if n0:
        sf = build_docs(n0)
        t0 = time.monotonic()
        out = qs["multimodal_phash_near_dups"](sf)
        walls[f"multimodal_phash_near_dups@{n0}"] = round(
            time.monotonic() - t0, 2
        )
        walls[f"multimodal_phash_near_dups@{n0}_rows"] = out.num_rows

    # SemDeDup at replicated-embedding scale: cells must stay ~sqrt(n), so
    # raise the coarse-quantizer knob for the big runs (documented in
    # similarity.py; the seeds are still the first IVF_CELLS by vec_id)
    from otelcol_con_spaneventtolog_ray.functions import similarity as sim

    old_cells = sim.IVF_CELLS
    try:
        for n in args.vecs:
            sf = build_embeddings(n)
            sim.IVF_CELLS = max(8, int(n ** 0.5) // 4)
            t0 = time.monotonic()
            out = sim.q_semdedup_keep(sf)
            walls[f"dedup_semantic_keep@{n}"] = round(
                time.monotonic() - t0, 2
            )
            walls[f"dedup_semantic_keep@{n}_cells"] = sim.IVF_CELLS
            kept = out.column("keep").to_numpy(zero_copy_only=False).sum()
            walls[f"dedup_semantic_keep@{n}_kept"] = int(kept)
    finally:
        sim.IVF_CELLS = old_cells
    print(json.dumps({"metric": "newops stress wall sec", "queries": walls,
                      "num_cpus": args.cpus}))
    ray.shutdown()


if __name__ == "__main__":
    main()
