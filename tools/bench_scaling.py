#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8 from
N to 4N executors, evidenced here by local[8] vs local[32] on the same input).

Runs bench.py's ER pipeline in TWO fresh subprocess JVMs (cold JVM each, same
corpus, same configs except parallelism) and writes BENCH/BASELINE.md with
throughput at both levels plus efficiency = T(4N) / (4 * T(N)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, families: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        EM_BENCH_FAMILIES=str(families),
        EM_BENCH_QUERIES_SKIP="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    families = int(os.environ.get("EM_SCALING_FAMILIES", "4000"))
    n_low, n_high = 8, 32

    print(f"[scaling] running local[{n_low}] ...", file=sys.stderr)
    low = run(n_low, families, sf_dir)
    print(f"[scaling] local[{n_low}]: {low['er']}", file=sys.stderr)
    print(f"[scaling] running local[{n_high}] ...", file=sys.stderr)
    high = run(n_high, families, sf_dir)
    print(f"[scaling] local[{n_high}]: {high['er']}", file=sys.stderr)

    t_low = low["er"]["pairs_scored_per_sec"]
    t_high = high["er"]["pairs_scored_per_sec"]
    eff = t_high / (4 * t_low)
    # end-to-end DAG efficiency as the secondary view
    e_low = low["er"]["er_wall_s"]
    e_high = high["er"]["er_wall_s"]
    eff_e2e = e_low / (4 * e_high)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# Scaling-efficiency evidence (N -> 4N)

North rule: throughput scaling efficiency >= 0.8 going from N to 4N
executors. No real cluster exists in this sandbox, so the same job runs at
two local parallelism levels — identical input ({families} synthetic
transcript families), identical configs, fresh JVM each — per the driver's
instruction.

| parallelism | pairs scored | score-stage s | pairs/sec | full-DAG s |
|---|---|---|---|---|
| local[{n_low}] (N) | {low['er']['scored']} | {low['er']['score_s']} | {t_low} | {e_low} |
| local[{n_high}] (4N) | {high['er']['scored']} | {high['er']['score_s']} | {t_high} | {e_high} |

- **Scoring-stage throughput efficiency**: T(4N) / (4 * T(N)) =
  {t_high} / (4 * {t_low}) = **{eff:.3f}**
- Full-DAG wall-clock efficiency (includes driver-side fixed costs — stage
  scheduling, SN offset collect, CC driver loop — which do not scale with
  cores): {e_low} / (4 * {e_high}) = {eff_e2e:.3f}

Caveat: single-machine scaling conflates cores with executors; shuffle is
in-process. The pipeline's scale levers for a real 1000-executor cluster —
salted pair self-join, capped hot keys, AQE skew handling, per-stage
checkpointing — are exercised identically at both levels.

Raw JSON:

```json
{json.dumps({"low": low, "high": high, "efficiency_pairs_per_sec": round(eff, 4),
             "efficiency_full_dag": round(eff_e2e, 4)}, indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 4), "low": t_low, "high": t_high}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
