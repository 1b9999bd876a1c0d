#!/usr/bin/env python
"""Interleaved A/B benchmark against a pinned prior commit.

Single-shot cross-session bench numbers on this box are unusable for
regression detection: the host swings 2-3.5x on memory-bandwidth-bound work
between sessions (VERDICT r2 bisected a "4x regression" to exactly this).
The only trustworthy round-over-round comparison is SAME-SESSION interleaved
A/B: run HEAD and the pinned ref alternately, minutes apart, on the same
pre-generated corpus, and compare best-of.

Usage:
    python tools/bench_ab.py <git-ref> [--rounds 2] [--families 2000]
                             [--cpus 16] [--keep-worktree]

Prints one JSON line:
    {"a_ref": "HEAD", "b_ref": <ref>, "a_runs": [...], "b_runs": [...],
     "a_best": s, "b_best": s, "speedup_a_over_b": x, ...}
where each run is the ER pipeline's score-stage seconds and pairs-scored/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_corpus(path: str, n_families: int) -> None:
    """Generate the shared corpus ONCE (pandas -> parquet, no Spark) so both
    sides measure the pipeline, never the generator."""
    sys.path.insert(0, REPO)
    from entity_matching_spark.sources.synth import generate_corpus

    pdf, _ = generate_corpus(n_families=n_families)
    # Spark cannot read nanosecond parquet timestamps (PARQUET_TYPE_ILLEGAL)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path, index=False)
    log(f"[ab] corpus: {len(pdf)} turns -> {path}")


def run_side(cwd: str, corpus: str, cpus: int) -> dict:
    """One bench.py ER-only invocation in ``cwd``; returns the parsed JSON."""
    env = dict(
        os.environ,
        EM_BENCH_TRANSCRIPTS=corpus,
        EM_BENCH_QUERIES_SKIP="1",
        EM_BENCH_ER_RUNS="1",  # interleaving supplies the repetition
        SPARK_GRAFT_CPUS=str(cpus),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        log(out.stderr[-2000:])
        raise RuntimeError(f"bench failed in {cwd}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="git ref to compare HEAD against")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--families", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--keep-worktree", action="store_true")
    args = ap.parse_args()

    wt = tempfile.mkdtemp(prefix="em_ab_wt_")
    subprocess.run(["git", "worktree", "add", "--detach", wt, args.ref],
                   cwd=REPO, check=True, capture_output=True)
    corpus = os.path.join(tempfile.mkdtemp(prefix="em_ab_corpus_"), "transcripts.parquet")
    try:
        gen_corpus(corpus, args.families)
        a_runs, b_runs = [], []
        for r in range(args.rounds):
            # alternate order each round so neither side always pays the
            # cold-cache / thermal penalty
            order = [("A", REPO, a_runs), ("B", wt, b_runs)]
            if r % 2 == 1:
                order.reverse()
            for name, cwd, acc in order:
                t0 = time.time()
                res = run_side(cwd, corpus, args.cpus)
                er = res["er"]
                acc.append({"score_s": er["score_s"],
                            "pairs_scored_per_sec": er["pairs_scored_per_sec"],
                            "er_wall_s": er["er_wall_s"]})
                log(f"[ab] round {r} side {name}: score {er['score_s']}s, "
                    f"{er['pairs_scored_per_sec']}/s ({time.time()-t0:.0f}s total)")
        a_best = max(x["pairs_scored_per_sec"] for x in a_runs)
        b_best = max(x["pairs_scored_per_sec"] for x in b_runs)
        print(json.dumps({
            "a_ref": "HEAD", "b_ref": args.ref,
            "families": args.families, "cpus": args.cpus, "rounds": args.rounds,
            "a_runs": a_runs, "b_runs": b_runs,
            "a_best": a_best, "b_best": b_best,
            "speedup_a_over_b": round(a_best / b_best, 3),
        }))
    finally:
        if not args.keep_worktree:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=REPO, capture_output=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
