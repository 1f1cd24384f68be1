"""Measured recall for the IVF ANN index (round-4 verdict item #3b): an
approximate index with unmeasured recall is not production-gradeable.

Corpus: sf0.1 embeddings (2,000 x 64-dim) replicated x40 with seeded
per-replica Gaussian noise (sigma=0.05 before renormalize) — 80,000
DISTINCT unit vectors, so top-k neighborhoods are continuous rather than
the all-ties cliques of embed_cluster_stress (identical replicas would
make recall trivially 1.0 and measure nothing).

System under test: the ENGINE's own path — `ivf_centroids` (k=64) +
`ivf_assign_frame` builds the index once, `_ivf_search` serves 100 query
vectors at n_probes in {1, 2, 4}. Ground truth: exact brute-force cosine
top-10 (numpy on the driver — it is the oracle, not the system).
Recall@10 = |IVF top-10 ∩ exact top-10| / 10, averaged over queries.

Usage: python scripts/ivf_recall.py [sf_dir]   (~2 min)
Writes BENCH/ivf_recall.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPL = 40
SIGMA = 0.05
N_QUERIES = 100
TOPK = 10
N_CENT = 64
PROBE_SWEEP = (1, 2, 4)


def build_stress_corpus(spark, sf_dir: str, out_dir: str):
    """The shared ANN-recall stress corpus (also imported by
    scripts/pq_recall.py): sf embeddings replicated x REPL with seeded
    per-replica Gaussian noise then renormalized — distinct unit vectors
    with continuous neighborhoods. Returns (emb_df, truth, n, dim) where
    truth maps qid -> exact cosine top-TOPK vec_id set (self excluded,
    ties broken (cosine desc, vec_id asc) like the engine)."""
    import pandas as pd

    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = np.array(list(base["embedding"]), dtype=np.float64)
    _n_base, dim = b.shape
    mats, ids = [], []
    for k in range(REPL):
        rng = np.random.default_rng(20260818 + k)
        m = b + (0.0 if k == 0 else SIGMA * rng.standard_normal(b.shape))
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        mats.append(m)
        ids.append(base["vec_id"].to_numpy() + k * 1_000_000)
    mat = np.concatenate(mats)  # (80000, 64)
    vec_ids = np.concatenate(ids)
    n = len(vec_ids)
    # ground truth must see EXACTLY what the engine reads: the float32
    # parquet values, renormalized in float64 like _ivf_search's kernel
    stored = mat.astype(np.float32)
    gt = stored.astype(np.float64)
    mat = gt / np.linalg.norm(gt, axis=1, keepdims=True)

    pdf = pd.DataFrame(
        {
            "vec_id": vec_ids.astype("int64"),
            "embedding": [[float(x) for x in r] for r in stored],
        }
    )
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>"
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    emb = spark.read.parquet(f"{out_dir}/embeddings.parquet")

    # --- ground truth: exact cosine top-10 for the query vectors --------
    order = np.argsort(vec_ids)
    sorted_ids = vec_ids[order]
    q_pos = order[:N_QUERIES]  # vec_ids 0..N_QUERIES-1 are replica 0
    assert (sorted_ids[:N_QUERIES] < N_QUERIES).all()
    q = mat[q_pos]
    sims = q @ mat.T  # unit vectors: cosine == dot
    truth: dict[int, set[int]] = {}
    for i in range(N_QUERIES):
        qid = int(vec_ids[q_pos[i]])
        s = sims[i].copy()
        s[q_pos[i]] = -np.inf  # exclude self, like _ivf_search does
        # tie-break (cosine desc, vec_id asc) to match the engine
        idx = np.lexsort((vec_ids, -s))[:TOPK]
        truth[qid] = set(int(vec_ids[j]) for j in idx)
    return emb, truth, n, dim


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = "/tmp/ivf_recall"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from janet_spark.queries_extra import (
        _ivf_search,
        ivf_assign_frame,
        ivf_centroids,
    )

    emb, truth, n, dim = build_stress_corpus(spark, sf_dir, out_dir)

    # --- index build (once) + probe sweep over the engine path ----------
    t0 = time.time()
    cent = ivf_centroids(emb, k=N_CENT)
    assigned = ivf_assign_frame(emb, cent).persist()
    n_assigned = assigned.count()
    build_sec = round(time.time() - t0, 2)
    assert n_assigned == n

    report = {
        "corpus_vectors": n,
        "dim": dim,
        "n_centroids": N_CENT,
        "n_queries": N_QUERIES,
        "topk": TOPK,
        "index_build_sec": build_sec,
        "probes": {},
    }
    def sweep(assigned_frame, probe_list, scan_mult):
        out = {}
        for p in probe_list:
            t0 = time.time()
            hits = (
                _ivf_search(
                    emb, assigned_frame, cent,
                    n_probes=p, topk=TOPK, n_queries=N_QUERIES,
                )
                .select("qid", "vec_id")
                .toPandas()
            )
            sec = round(time.time() - t0, 2)
            got = hits.groupby("qid")["vec_id"].apply(set).to_dict()
            recalls = [
                len(got.get(qid, set()) & truth[qid]) / TOPK for qid in truth
            ]
            out[str(p)] = {
                "recall_at_10": round(float(np.mean(recalls)), 4),
                "min_query_recall": round(float(np.min(recalls)), 4),
                "query_sweep_sec": sec,
                "scanned_fraction": round(p * scan_mult / N_CENT, 4),
            }
            print(f"probes={p} (x{scan_mult} index): "
                  f"recall@10={out[str(p)]['recall_at_10']}"
                  f" (min {out[str(p)]['min_query_recall']}) in {sec}s")
        return out

    report["probes"] = sweep(assigned, PROBE_SWEEP, 1)

    # --- multi-assignment (spill=2) index: the write-side recall dial ---
    t0 = time.time()
    assigned2 = ivf_assign_frame(emb, cent, spill=2).persist()
    n2 = assigned2.count()
    spill_build_sec = round(time.time() - t0, 2)
    assert n2 == 2 * n
    report["spill2"] = {
        "index_rows": n2,
        "index_build_sec": spill_build_sec,
        "probes": sweep(assigned2, (1, 2), 2),
    }
    assigned2.unpersist()

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ivf_recall.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
