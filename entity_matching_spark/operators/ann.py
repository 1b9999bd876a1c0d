"""Approximate-nearest-neighbor search over embedding columns.

Training-data pipelines need similarity search over an ``array<float>``
embedding column at corpus scale. Two paths:

- ``brute_force_topk``: exact cosine top-k via cross join — the correctness
  baseline and the oracle for the approximate path. O(|probes| * |vectors|);
  fine for evaluation probes, not for corpus-vs-corpus.
- ``ivf_topk``: IVF (inverted-file) cell-restricted search — the scale path.
  Every vector is assigned to its nearest coarse centroid once
  (``assign_cells``); a probe searches only its ``n_probe`` nearest cells.
  Work drops from |V| to ~|V| * n_probe / n_cells per probe, and the
  candidate join shuffles on ``centroid_id`` — bounded by cell size, which
  the centroid count controls.

Scale notes (100 TB design):
- The centroid table is a MODEL PARAMETER (k centroids, k ~ sqrt(|V|) in
  practice), not data-sized — broadcasting it is correct and intended, unlike
  broadcasting data-derived tables.
- Cell assignment is one |V| x k scan with the broadcast centroids: no
  shuffle until the final per-cell aggregation, and it materializes once for
  any number of probe batches.
- All dot products run JVM-side (``F.zip_with`` + ``F.aggregate`` inside
  whole-stage codegen); no Python in the hot path.

No reference analog (graft-brief requirement beyond fmateoc/entity-matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def cosine(a, b) -> F.Column:
    """Cosine similarity of two array<double> columns, JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _emb(col) -> F.Column:
    return F.col(col).cast("array<double>")


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF coarse quantization: (vec_id, centroid_id) — nearest centroid by
    cosine, ties broken by centroid_id for determinism.

    ``vectors``: (vec_id, embedding); ``centroids``: (centroid_id, cemb).
    The centroid side is broadcast (fixed-k model table, never data-sized).
    """
    sims = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "centroid_id",
        cosine(_emb("embedding"), _emb("cemb")).alias("cos"),
    )
    # argmax as a map-side-combinable aggregate — max of (cos, -centroid_id)
    # reproduces the (cos DESC, centroid_id ASC) ordering exactly. A window
    # would shuffle and sort ALL |V| x k similarity rows on vec_id; the
    # partial aggregate collapses each vector's k rows to one before the
    # shuffle — a k-fold shuffle reduction on the training/assignment scan.
    best = sims.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("centroid_id")).alias("neg_id"))).alias("m")
    )
    return best.select("vec_id", (-F.col("m.neg_id")).alias("centroid_id"))


def probe_cells(probes: DataFrame, centroids: DataFrame, n_probe: int) -> DataFrame:
    """(probe_id, centroid_id) for each probe's ``n_probe`` nearest cells,
    carrying the probe embedding through for the downstream scoring join."""
    sims = probes.crossJoin(F.broadcast(centroids)).select(
        "probe_id", "pe", "centroid_id",
        cosine(_emb("pe"), _emb("cemb")).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        sims.withColumn("r", F.row_number().over(w)).where(F.col("r") <= n_probe)
        .select("probe_id", "pe", "centroid_id")
    )


def brute_force_topk(vectors: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Exact cosine top-k: (probe_id, rank, neighbor_id). The oracle path."""
    cand = vectors.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    sims = (
        probes.crossJoin(cand)
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id", cosine(_emb("pe"), _emb("ce")).alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )


def ivf_topk(
    vectors: DataFrame, centroids: DataFrame, probes: DataFrame, k: int, n_probe: int
) -> DataFrame:
    """IVF cell-restricted top-k: search only each probe's ``n_probe``
    nearest cells. (probe_id, rank, neighbor_id); approximate — recall
    against ``brute_force_topk`` is the quality metric (see ivf_recall).
    """
    assign = assign_cells(vectors, centroids)
    pc = probe_cells(probes, centroids, n_probe)
    cand = (
        pc.join(assign, "centroid_id")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "pe", F.col("vec_id").alias("neighbor_id"))
    )
    scored = cand.join(
        vectors.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")),
        "neighbor_id",
    ).select("probe_id", "neighbor_id", cosine(_emb("pe"), _emb("ce")).alias("cos"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
        .select("probe_id", "rank", "neighbor_id")
    )


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Train IVF coarse centroids with deterministic distributed Lloyd's
    iterations: (centroid_id, cemb).

    Completes the ANN family from raw embeddings (previously the centroid
    table was an input the pipeline couldn't make). Each iteration is the
    classic two-step Spark shape:

    - ASSIGN: |V| x k cosine scan against the broadcast centroids (reuses
      ``assign_cells`` — no shuffle until the argmax window on vec_id);
    - UPDATE: posexplode + groupBy (centroid_id, dim) mean — one shuffle of
      |V| x dims skinny rows per iteration; empty cells keep their previous
      centroid.

    Determinism pin: init is the ``k`` vectors with the SMALLEST ids (no
    RNG), and every updated centroid coordinate is rounded to ``round_dp``
    decimals — float summation order differs across partitions and engines,
    and the rounding quantizes that noise away, making the trained centroids
    exactly reproducible (fixed input -> bit-identical output, DuckDB
    oracle-checkable). k-means|| seeding would be the production choice for
    quality; first-k-by-id keeps the training run replayable and testable,
    which the 100 TB pipeline needs more (the IVF recall metric measures the
    quality impact either way).

    Lineage is truncated per iteration (localCheckpoint on the k x 1 table)
    so the plan does not deepen with ``n_iter`` — same discipline as the
    connected-components loop (operators/cluster.py).
    """
    cents = (
        vectors.orderBy(id_col).limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("centroid_id"),
            _emb(emb_col).alias("cemb"),
        )
    )
    for _ in range(n_iter):
        assign = assign_cells(
            vectors.select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("embedding")),
            cents,
        )
        dims = (
            assign.join(
                vectors.select(F.col(id_col).alias("vec_id"), _emb(emb_col).alias("e")),
                "vec_id",
            )
            .select("centroid_id", F.posexplode("e").alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("v"), round_dp).alias("v"))
        )
        updated = dims.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
            ).alias("cemb")
        )
        cents = (
            cents.select("centroid_id", F.col("cemb").alias("prev"))
            .join(updated, "centroid_id", "left")
            .select("centroid_id", F.coalesce("cemb", "prev").alias("cemb"))
            .localCheckpoint()
        )
    return cents


def ivf_recall(ivf: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Per-probe recall@k of the IVF result against the exact baseline:
    (probe_id, n_hits, recall)."""
    hits = exact.join(
        ivf.select("probe_id", "neighbor_id"), ["probe_id", "neighbor_id"]
    ).groupBy("probe_id").agg(F.count("*").alias("n_hits"))
    return (
        exact.select("probe_id").distinct()
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / k, 6).alias("recall"),
        )
    )
