"""Two-parallelism scaling evidence for the north rule.

The rule requires >=0.8 throughput scaling efficiency between N and 4N
executor clusters; no real cluster exists in this sandbox, so (per the
driver instruction) the identical job runs at two local parallelism levels
— local[8] vs local[32] — on the same input, and we report throughput at
both plus efficiency = (rate_32 / rate_8) / 4.

Each level runs in a fresh subprocess (fresh JVM) so parallelism is honest.
The input is the sf-dir derived transcripts PLUS one synthetic 10^4-turn
skewed conversation (FIXTURES.md bench tier), materialized once to parquet.

Usage: python scripts/scaling_bench.py            # parent: runs both levels
       python scripts/scaling_bench.py --child 8  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data")
INPUT = os.path.join(DATA, "transcripts_bench")
LEVELS = (8, 32)
RESULT_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "BASELINE.md"
)


def materialize(sf_dir: str) -> None:
    from janet_spark.derive import derived_transcripts
    from janet_spark.session import build_session
    from janet_spark.synthetic import make_transcripts

    spark = build_session("scaling-prep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    tr = derived_transcripts(spark, sf_dir)
    skew_pd, _ = make_transcripts(n_convs=1, skew_turns=10_000, seed=7)
    skew_pd["conv_id"] = "conv-skewed-bench"
    skew = spark.createDataFrame(
        skew_pd,
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    tr.unionByName(skew).write.mode("overwrite").parquet(INPUT)
    spark.stop()


def child(cpus: int) -> None:
    from janet_spark.pipeline import extract_only
    from janet_spark.reassemble import reassemble_conversations
    from janet_spark.session import build_session

    spark = build_session(
        f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(INPUT)
    n = tr.count()
    # warm the JVM/Arrow path so we measure steady-state throughput
    extract_only(tr.limit(2000), detect_skew=False).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    out = extract_only(tr, skew_threshold=1000, salt_buckets=16, detect_skew=True)
    reassemble_conversations(out).write.format("noop").mode("overwrite").save()
    sec = time.time() - t0
    print(json.dumps({"cpus": cpus, "sec": round(sec, 3), "turns": n}))
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return 0

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(DATA, exist_ok=True)
    materialize(sf_dir)

    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    n8, n32 = results[LEVELS[0]], results[LEVELS[1]]
    rate8 = n8["turns"] / n8["sec"]
    rate32 = n32["turns"] / n32["sec"]
    eff = (rate32 / rate8) / (LEVELS[1] / LEVELS[0])
    summary = {
        "turns": n8["turns"],
        f"rate_local{LEVELS[0]}_turns_per_sec": round(rate8, 1),
        f"rate_local{LEVELS[1]}_turns_per_sec": round(rate32, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "sf_dir": sf_dir,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(RESULT_MD), exist_ok=True)
    with open(RESULT_MD, "w") as f:
        f.write(
            "# BENCH baseline — extraction throughput + scaling efficiency\n\n"
            "Same job (read -> skew-salted repartition -> Arrow extraction UDF ->\n"
            "window-ordered reassembly), same input "
            f"({n8['turns']:,} turns = derived sf transcripts + one 10^4-turn\n"
            "skewed conversation), two parallelism levels in fresh JVMs — the\n"
            "sandbox stand-in for N vs 4N executor clusters per the driver\n"
            "instruction.\n\n"
            "| parallelism | wall sec | turns/sec |\n|---|---|---|\n"
            f"| local[{LEVELS[0]}] | {n8['sec']} | {rate8:,.1f} |\n"
            f"| local[{LEVELS[1]}] | {n32['sec']} | {rate32:,.1f} |\n\n"
            f"**Scaling efficiency (rate_{LEVELS[1]} / rate_{LEVELS[0]}) / 4 = "
            f"{eff:.3f}** (target >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n\n"
            f"sf_dir: `{sf_dir}`\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
