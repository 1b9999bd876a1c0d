#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): candidate-pairs-scored/sec through the full
record-linkage DAG (assemble -> extract -> block -> salted pair-join -> score
-> decide) over a synthetic transcript corpus sized to the scale factor,
plus per-query wall times for representative operators over
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  EM_BENCH_FAMILIES   override ER corpus size (families)

Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors) is
produced by tools/bench_scaling.py which runs THIS pipeline at local[8] and
local[32]; results in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def calibrate_host(n_pairs: int = 200_000, reps: int = 3) -> dict:
    """Bare-numpy JW-kernel throughput on a fixed deterministic workload —
    the host-speed yardstick printed alongside every bench run.

    This box swings 2-3.5x between sessions on memory-bandwidth-bound work
    (measured round 1-2; VERDICT r2 bisected a '4x regression' to exactly
    this). Dividing any bench number by the same-session calibration factor
    makes cross-session comparisons meaningful; same-session A/B
    (tools/bench_ab.py) remains the gold standard.
    """
    import random

    from entity_matching_spark.functions.similarity import (
        encode_strings, jaro_winkler_encoded,
    )

    rng = random.Random(42)
    words = ["capital", "global", "fund", "partners", "asset", "mgmt",
             "holdings", "trust", "bank", "advisors", "group", "intl"]
    names_a = [" ".join(rng.choices(words, k=rng.randint(2, 5))) for _ in range(n_pairs)]
    names_b = [" ".join(rng.choices(words, k=rng.randint(2, 5))) for _ in range(n_pairs)]
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        ea, eb = encode_strings(names_a), encode_strings(names_b)
        jaro_winkler_encoded(ea, eb)
        best = max(best, n_pairs / (time.time() - t0))
    return {"jw_pairs_per_sec": round(best, 0), "n_pairs": n_pairs, "reps": reps}


def run_er_pipeline(spark, n_families: int, transcripts=None) -> dict:
    """Run the PRODUCTION pipeline path (plans/pipeline.py with parquet stage
    checkpoints) into a fresh work dir; stage timings come from the lineage
    manifests, so the benchmark measures exactly what a cluster run does.

    Set EM_BENCH_TRANSCRIPTS to a parquet path to reuse a pre-generated
    corpus (the scaling harness generates once and runs twice)."""
    import shutil
    import tempfile

    from entity_matching_spark.plans.pipeline import run_pipeline
    from entity_matching_spark.sources.synth import generate_corpus, transcripts_to_spark

    t0 = time.time()
    pre = os.environ.get("EM_BENCH_TRANSCRIPTS")
    if transcripts is None:
        if pre:
            transcripts = spark.read.parquet(pre)
        else:
            pdf, _ = generate_corpus(n_families=n_families)
            transcripts = transcripts_to_spark(spark, pdf).localCheckpoint()
    n_turns = transcripts.count()
    gen_s = time.time() - t0

    workdir = tempfile.mkdtemp(prefix="em_bench_")
    t1 = time.time()
    result = run_pipeline(spark, transcripts, workdir, resume=False)
    er_wall_s = time.time() - t1
    stages = {m["stage"]: m for m in result.metrics}
    n_clustered = stages["s6_components"]["output_rows"]
    shutil.rmtree(workdir, ignore_errors=True)

    score_s = stages["s4_scored"]["wall_ms"] / 1000
    n_scored = stages["s4_scored"]["output_rows"]
    return {
        "turns": n_turns, "records": stages["s1_records"]["output_rows"],
        "pairs": stages["s3_pairs"]["output_rows"],
        "scored": n_scored, "clustered_nodes": n_clustered,
        "gen_s": round(gen_s, 2),
        "assemble_s": round(stages["s1_records"]["wall_ms"] / 1000, 2),
        "block_s": round(stages["s3_pairs"]["wall_ms"] / 1000, 2),
        "score_s": round(score_s, 2),
        "cc_s": round(stages["s6_components"]["wall_ms"] / 1000, 2),
        "er_wall_s": round(er_wall_s, 2),
        "pairs_scored_per_sec": round(n_scored / max(score_s, 1e-9), 1),
    }


# testdata queries benchmarked per round (subset of __spark_entry__.queries())
BENCH_QUERIES = [
    "em_assemble", "em_extract_identifiers", "em_normalize_names",
    "em_similarity", "em_sorted_neighborhood",
    "em_top_k", "em_connected_components", "em_catalog_match",
    "dedup_minhash_verified", "dedup_token_jaccard",
    "dedup_simhash_pairs", "dedup_canonical",
    "dedup_substring", "dedup_substring_removal",
    "doc_fingerprint", "ann_cosine_topk", "ann_ivf_search", "ann_kmeans_train",
    "ann_ivf_recall_pp", "ann_quantized_recall",
    "text_quality_score", "text_lang_id", "text_bm25", "text_bm25_table",
    "text_tfidf", "text_pack",
    "text_pii", "text_contamination", "text_sample", "text_repetition",
    "text_curation", "text_vocab",
    "multimodal_features", "multimodal_frames",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_families = int(os.environ.get("EM_BENCH_FAMILIES", max(200, int(20000 * sf))))

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("em-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("EM_BENCH_DRIVER_MEM", "24g"))
    )
    # EM_BENCH_LOCAL_DIR (e.g. /dev/shm/spark-local): put shuffle files on
    # tmpfs so a single box emulates a cluster's per-executor disks — without
    # it, all parallelism levels share one disk's bandwidth and the N-vs-4N
    # comparison measures the disk, not the engine
    local_dir = os.environ.get("EM_BENCH_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    spark = (
        builder
        .config("spark.driver.extraJavaOptions", "-Xss32m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # per-call call-site capture (error-message enrichment only) costs
        # 3 Py4J round trips per DataFrame API call; measured ~30% of warm
        # plan-authoring time on the deep scoring plan — off for benchmarks
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    t_total = time.time()
    cal = calibrate_host()
    log(f"[bench] host calibration: {cal}")

    # best-of-k ER runs: single cold runs on this box are contaminated by
    # host-speed swings (VERDICT r2; round 4 again measured 29k vs 8.9k for
    # the SAME binary within one session). k=3 with best-of reported is the
    # round-over-round comparable number, er_runs keeps the raw samples
    er_k = int(os.environ.get("EM_BENCH_ER_RUNS", "3"))
    log(f"[bench] ER pipeline: {n_families} families, local[{cpus}], best of {er_k}")
    # generate the corpus ONCE; every run measures the pipeline, not the gen
    from entity_matching_spark.sources.synth import generate_corpus, transcripts_to_spark

    if os.environ.get("EM_BENCH_TRANSCRIPTS"):
        shared_transcripts = None  # run_er_pipeline reads the parquet itself
    else:
        pdf, _ = generate_corpus(n_families=n_families)
        shared_transcripts = transcripts_to_spark(spark, pdf).localCheckpoint()
    er_runs = []
    for i in range(er_k):
        r = run_er_pipeline(spark, n_families, transcripts=shared_transcripts)
        log(f"[bench] ER run {i}: {r}")
        er_runs.append(r)
    er = max(er_runs, key=lambda r: r["pairs_scored_per_sec"])

    qtimes: dict[str, float] = {}
    qs = entrymod.queries()
    bench_queries = [] if os.environ.get("EM_BENCH_QUERIES_SKIP") else BENCH_QUERIES
    for name in bench_queries:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        qtimes[name] = round(time.time() - t0, 3)
        log(f"[bench] {name}: {n} rows in {qtimes[name]}s")
    qtimes["er_pipeline"] = er["er_wall_s"]

    total = round(time.time() - t_total - er["gen_s"], 2)
    out = {
        "metric": "candidate_pairs_scored_per_sec",
        "value": er["pairs_scored_per_sec"],
        # host-speed-normalized headline: pipeline pairs/sec per unit of
        # bare-kernel JW pairs/sec measured the same session — BENCH_r{N}
        # files are directly comparable across rounds without manual division
        "value_per_kcal": round(
            er["pairs_scored_per_sec"] / max(cal["jw_pairs_per_sec"], 1e-9), 4
        ),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "total_wall_sec": total,
        "cpus": cpus,
        "er": er,
        "er_runs": [r["pairs_scored_per_sec"] for r in er_runs],
        "er_best_of": er_k,
        "calibration": cal,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
