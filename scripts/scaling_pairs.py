"""Interleaved-pair scaling measurement for the N vs 4N criterion.

scaling_bench.py measures each parallelism level in its own ~5-minute
window; on this multi-tenant sandbox VM the co-tenancy profile shifts
between windows, so the 4->16 ratio compares DIFFERENT contention
regimes and swings across the 0.8 threshold in both directions
(measured: 1.001, 0.679, 0.702 across three full runs of identical
code). The statistically sound estimator for a RATIO on a noisy host is
paired sampling: run the two levels back-to-back (4c, 16c, 4c, 16c, ...)
so each pair shares one contention window, compute the efficiency per
pair, and report the MEDIAN of pairs. This does not change what is
measured — the same job, same input, fresh JVM per level — only when.

Usage: python scripts/scaling_pairs.py [n_pairs]  (default 3; appends a
section to BENCH/BASELINE.md and writes BENCH/scaling_pairs.json)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_SCRIPT = os.path.join(ROOT, "scripts", "scaling_bench.py")
LO, HI = 4, 16


def run_child(cpus: int) -> dict:
    r = subprocess.run(
        [sys.executable, BENCH_SCRIPT, "--child", str(cpus)],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # input must already be materialized by a prior scaling_bench.py run
    from scripts.scaling_bench import INPUT  # noqa: E402

    assert os.path.exists(INPUT), "run scripts/scaling_bench.py once first"

    pairs = []
    for p in range(n_pairs):
        lo = run_child(LO)
        hi = run_child(HI)
        eff = round((lo["sec"] / hi["sec"]) / (HI / LO), 3)
        pairs.append({"pair": p, "lo": lo, "hi": hi, "eff": eff})
        print(
            f"pair {p}: {LO}c best={lo['sec']}s {HI}c best={hi['sec']}s "
            f"eff={eff}"
        )

    effs = [p["eff"] for p in pairs]
    med = round(statistics.median(effs), 3)
    turns = pairs[0]["lo"]["turns"]
    summary = {
        "protocol": f"interleaved pairs {LO}c/{HI}c, median of {n_pairs}",
        "pair_efficiencies": effs,
        "median_efficiency": med,
        "turns": turns,
        "rate_lo_best": round(turns / min(p["lo"]["sec"] for p in pairs), 1),
        "rate_hi_best": round(turns / min(p["hi"]["sec"] for p in pairs), 1),
        "target": 0.8,
        "pass": med >= 0.8,
        "pairs": pairs,
    }
    with open(os.path.join(ROOT, "BENCH", "scaling_pairs.json"), "w") as f:
        json.dump(summary, f, indent=2)
    # append a dated section to BENCH/BASELINE.md (below scaling_bench's
    # preservation marker) instead of overwriting anything
    import datetime

    stamp = datetime.date.today().isoformat()
    rows = "\n".join(
        f"| {p['pair']} | {p['lo']['sec']} s | {p['hi']['sec']} s | {p['eff']} |"
        for p in pairs
    )
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Paired-protocol run {stamp}\n\n"
            f"Interleaved pairs {LO}c/{HI}c (each pair shares one contention\n"
            "window; detail + all raw runs in BENCH/scaling_pairs.json):\n\n"
            f"| pair | {LO}c best | {HI}c best | efficiency |\n|---|---|---|---|\n"
            f"{rows}\n\n"
            f"**Median paired efficiency {LO}->{HI} = {med} (target >= 0.8: "
            f"{'PASS' if med >= 0.8 else 'FAIL'})**\n"
        )
    print(json.dumps({k: v for k, v in summary.items() if k != "pairs"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
