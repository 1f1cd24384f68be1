"""One-command acceptance battery — everything the round gate checks,
locally reproducible:

    python scripts/acceptance.py [--fast] [--stress]

1. full pytest suite
2. oracle gate at sf0.01 AND sf0.001
3. oracle gate again under adversarial parallelism (local[3], 7 shuffle
   partitions) — partition invariance
4. driver contract: entry() rows > 0, len(queries()) == len(oracle_sql())
5. bench.py emits exactly one parseable JSON line (skipped with --fast)
6. with --stress: the cheapest discriminating scale stress — the
   verify-tail prefilter against a planted 10^6-turn hot bucket
   (scripts/conv_verify_prefilter_stress.py, ~30 s), whose hard asserts
   pin identical-output AND the bounded verify fan-out; a scale
   regression on the conversation verify tail now fails the battery
   instead of waiting for a judge read (round-4 verdict "Next round" #7).

Prints one PASS/FAIL line per step and exits nonzero on any failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def step(name: str, argv: list[str], env: dict | None = None) -> tuple[bool, str]:
    t0 = time.time()
    e = {**os.environ, **(env or {})}
    r = subprocess.run(argv, capture_output=True, text=True, cwd=ROOT, env=e)
    sec = time.time() - t0
    ok = r.returncode == 0
    print(f"{'PASS' if ok else 'FAIL'}  {name} [{sec:.0f}s]")
    if not ok:
        tail = (r.stdout + r.stderr).strip().splitlines()[-12:]
        print("      " + "\n      ".join(tail))
    return ok, r.stdout


def main() -> int:
    fast = "--fast" in sys.argv
    results = []

    results.append(step("pytest", [sys.executable, "-m", "pytest", "tests/", "-q", "-p", "no:cacheprovider"])[0])
    results.append(step("oracles sf0.01", [sys.executable, "scripts/check_oracles.py", "/root/testdata/sf0.01"])[0])
    results.append(step("oracles sf0.001", [sys.executable, "scripts/check_oracles.py", "/root/testdata/sf0.001"])[0])
    results.append(
        step(
            "oracles adversarial parallelism",
            [sys.executable, "scripts/check_oracles.py", "/root/testdata/sf0.001"],
            env={"ORACLE_CHECK_MASTER": "local[3]", "ORACLE_CHECK_SHUFFLE": "7"},
        )[0]
    )

    contract = (
        "import sys; sys.path.insert(0, '.')\n"
        "from pyspark.sql import SparkSession\n"
        "import __spark_entry__ as m\n"
        "spark = (SparkSession.builder.master('local[8]')"
        ".config('spark.sql.shuffle.partitions','16').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "assert len(m.entry(spark).collect()) > 0\n"
        "q, o = m.queries(), m.oracle_sql()\n"
        "assert len(q) == len(o) and set(q) == set(o), (len(q), len(o))\n"
        "print('queries:', len(q))\n"
    )
    results.append(step("driver contract", [sys.executable, "-c", contract])[0])

    if not fast:
        ok, out = step(
            "bench",
            [sys.executable, "bench.py"],
            env={"SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")},
        )
        if ok:
            try:
                last = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
                json.loads(last)
            except Exception:
                print("FAIL  bench JSON parse")
                ok = False
        results.append(ok)

    if "--stress" in sys.argv:
        results.append(
            step(
                "stress: verify-tail prefilter (planted hot bucket)",
                [sys.executable, "scripts/conv_verify_prefilter_stress.py", "--fast"],
            )[0]
        )

    print("ACCEPTANCE", "PASS" if all(results) else "FAIL")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
