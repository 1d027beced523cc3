"""Weak-scaling evidence: FIXED WORK PER EXECUTOR at 1 vs 4 executor
JVMs — the complement of tools/scaling_bench.py's strong-scaling pair
(same input, more executors). Here the input grows with the cluster
(x{C} docs on 1 executor vs x{4C} on 4), so ideal scaling is FLAT wall
time and efficiency = t(N, W) / t(4N, 4W).

This is the shape a real 100 TB deployment cares about most: "if I
double the corpus and double the cluster, does the build take the same
time?" — it cannot be gamed by fixed driver-side overhead amortization
the way strong scaling at small inputs can, because both levels pay
the same per-job driver cost relative to their own runtime.

Levels are interleaved and best-of-ATTEMPTS per level, same
methodology (and same child runner) as scaling_bench.py. Appends a
markdown section to stdout; the curated record lives in
BENCH/BASELINE.md.

Usage: python tools/weak_scaling.py [cycles_per_executor]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import ATTEMPTS, CHILD, SF_DIR  # noqa: E402

CYCLES_PER_EXEC = int(sys.argv[1]) if len(sys.argv) > 1 else 24


def run_level(cpus: int, cycles: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(cycles),
         str(ATTEMPTS), SF_DIR],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child local-cluster[{cpus}] failed:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def main() -> None:
    levels = [(1, CYCLES_PER_EXEC), (4, 4 * CYCLES_PER_EXEC)]
    best: dict[int, dict] = {}
    for rnd in range(2):
        for cpus, cycles in levels:
            r = run_level(cpus, cycles)
            print(f"  round {rnd} {cpus} exec x{cycles}:", json.dumps(r))
            b = best.get(cpus)
            if b is None or r["build_sec"] < b["build_sec"]:
                best[cpus] = r
    r1, r4 = best[1], best[4]
    eff = r1["build_sec"] / r4["build_sec"]
    print()
    print(f"| executors | input docs | build sec | docs/sec |")
    print(f"|---|---|---|---|")
    for cpus in (1, 4):
        r = best[cpus]
        print(f"| {cpus} | {r['n_docs']} | {r['build_sec']} "
              f"| {r['docs_per_sec']} |")
    print()
    print(f"weak-scaling efficiency t(1 exec, W) / t(4 exec, 4W) "
          f"= {r1['build_sec']} / {r4['build_sec']} = {eff:.3f} "
          f"(ideal 1.0, flat wall time)")


if __name__ == "__main__":
    main()
