"""Fuzzy (MinHash-LSH) benchmark decontamination: planted contamination
matched EXACTLY against a brute-force max-Jaccard oracle built from the
scalar shingle mirror — found pairs, partners, and jaccard values."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from otelcol_con_spaneventtolog_ray.functions.decontam import (
    DECON_BENCH_MOD,
    q_decontaminate_fuzzy,
)
from otelcol_con_spaneventtolog_ray.functions.dedup import word_shingles


def _write_docs(tmp_path, texts, ids):
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["web"] * len(ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_fuzzy_decontam_matches_bruteforce_oracle(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    words = "alpha beta gamma delta eps zeta eta theta iota kappa".split()
    n = 300
    ids = list(range(n))
    texts = [" ".join(rng.choice(words, size=50)) for _ in range(n)]
    M = DECON_BENCH_MOD  # benchmark ids: 0, M, 2M
    pa_, pb, pc = M + 1, M + 2, M + 3  # planted ids, never % M == 0
    texts[pa_] = texts[M].replace("alpha", "omega", 1)  # near copy (j~0.9)
    texts[pb] = texts[0]                                # exact copy (j=1.0)
    half = texts[2 * M].split()                         # heavy edit (j<0.5)
    texts[pc] = " ".join(half[:10] + ["zzz"] * 40)
    sf = _write_docs(tmp_path, texts, ids)

    got = q_decontaminate_fuzzy(sf).to_pandas()
    bench = {i: word_shingles(texts[i]) for i in (0, M, 2 * M)}
    exp = []
    for i in range(n):
        if i % M == 0:
            continue  # self-exclusion contract
        s = word_shingles(texts[i])
        for b, bs in bench.items():
            inter = len(s & bs)
            if inter and 3 * inter >= len(s) + len(bs):  # j >= 0.5 exact
                exp.append((i, b, round(inter / (len(s | bs)), 6)))
    got_pairs = list(
        got[["doc_id", "bench_doc_id", "jaccard"]].itertuples(
            index=False, name=None
        )
    )
    assert sorted(got_pairs) == sorted(exp)
    near = [(d, b, j) for d, b, j in got_pairs if d == pa_ and b == M]
    assert len(near) == 1 and 0.7 <= near[0][2] < 1.0  # near copy found
    assert (pb, 0, 1.0) in got_pairs
    assert not any(d == pc for d, _, _ in got_pairs)  # heavy edit below 0.5


def test_fuzzy_decontam_empty_and_no_benchmark(ray_session, tmp_path):
    # no benchmark doc (no id % MOD == 0) -> empty result, stable schema
    sf = _write_docs(tmp_path, ["a b c", "d e f"], [1, 2])
    out = q_decontaminate_fuzzy(sf).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "bench_doc_id", "jaccard"]
