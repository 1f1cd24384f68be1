"""Measured recall for the product-quantization ANN path (the memory-
compression scale dial next to IVF's candidate-pruning one): an
approximate index with unmeasured recall is not production-gradeable.

Corpus: the SAME 80k-distinct-unit-vector stress corpus as
scripts/ivf_recall.py (imported from there). System under test: the
ENGINE's own path — `pq_codebooks` + `pq_encode_frame` builds the code
table, `pq_lut_frame` + `_pq_adc_search` serves 100 query vectors.
Ground truth: exact brute-force cosine top-10. Codebook-size sweep
k in {16, 64, 256} at m=4 subspaces — 4 code bytes per vector (k<=256)
vs the 256-byte float32 vector, a 64x memory reduction at every k.

ADC ranks by quantized L2 on renormalized unit vectors, where
L2^2 = 2 - 2*cosine is order-equivalent to cosine, so recall@10 against
the cosine ground truth measures quantization loss alone.

Usage: python scripts/pq_recall.py [sf_dir]   (~3 min)
Writes BENCH/pq_recall.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ivf_recall import N_QUERIES, TOPK, build_stress_corpus

MK_SWEEP = ((4, 16), (4, 256), (8, 16), (8, 256))
RERANK_R = 100  # ADC shortlist size for the exact-re-rank ceiling


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = "/tmp/pq_recall"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from janet_spark.queries_extra import (
        _pq_adc_search,
        pq_codebooks,
        pq_encode_frame,
        pq_lut_frame,
    )

    emb, truth, n, dim = build_stress_corpus(spark, sf_dir, out_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    report = {
        "corpus_vectors": n,
        "dim": dim,
        "n_queries": N_QUERIES,
        "topk": TOPK,
        "rerank_shortlist": RERANK_R,
        "float32_bytes_per_vector": dim * 4,
        "configs": {},
    }
    for m, k in MK_SWEEP:
        t0 = time.time()
        cent = pq_codebooks(emb, k=k)
        codes = pq_encode_frame(emb, cent, m=m).persist()
        n_codes = codes.count()
        build_sec = round(time.time() - t0, 2)
        assert n_codes == n * m

        # ONE ADC pass at topk=RERANK_R gives both numbers: the pure-ADC
        # recall (its top-10 prefix) and the exact-re-rank ceiling (any
        # truth member inside the shortlist survives an exact re-rank)
        t0 = time.time()
        hits = (
            _pq_adc_search(codes, pq_lut_frame(queries, cent, m=m), topk=RERANK_R)
            .select("qid", "rank", "vec_id")
            .toPandas()
        )
        sweep_sec = round(time.time() - t0, 2)
        codes.unpersist()
        top10 = hits[hits["rank"] <= TOPK]
        got10 = top10.groupby("qid")["vec_id"].apply(set).to_dict()
        gotR = hits.groupby("qid")["vec_id"].apply(set).to_dict()
        adc = [len(got10.get(q, set()) & truth[q]) / TOPK for q in truth]
        rr = [len(gotR.get(q, set()) & truth[q]) / TOPK for q in truth]
        key = f"m{m}_k{k}"
        report["configs"][key] = {
            "code_bytes_per_vector": m,
            "memory_reduction_x": dim * 4 // m,
            "adc_recall_at_10": round(float(np.mean(adc)), 4),
            "rerank_recall_at_10": round(float(np.mean(rr)), 4),
            "min_query_rerank_recall": round(float(np.min(rr)), 4),
            "encode_sec": build_sec,
            "query_sweep_sec": sweep_sec,
        }
        print(
            f"{key}: adc recall@10={report['configs'][key]['adc_recall_at_10']}"
            f" rerank@{RERANK_R} recall@10="
            f"{report['configs'][key]['rerank_recall_at_10']}"
            f" encode {build_sec}s sweep {sweep_sec}s"
        )

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/pq_recall.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
