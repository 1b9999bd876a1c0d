"""entity_matching_spark — a PySpark-native record-linkage (entity-resolution) engine.

A brand-new, Spark-first implementation of the blocking + pairwise-scoring +
transitive-clustering capabilities of the reference system (fmateoc/entity-matching,
a single-record-at-a-time Java application). This package re-expresses every
reference operator as set-oriented DataFrame transformations:

- ``functions``  : scalar/text kernels — normalization (reference
  ``CharacterNormalizer``/``NameNormalizer``), vectorized similarity
  (Jaro-Winkler / Levenshtein / token-Jaccard), constant lookup tables.
- ``operators``  : DataFrame-level stages — record assembly from transcripts,
  field extraction, blocking + pair generation (skew-aware), pairwise scoring +
  discrepancy detection + decisions, connected-components clustering, plus
  large-scale training-data operators (dedup, similarity search, text stats).
- ``sources``    : deterministic synthetic data generators and IO helpers.
- ``plans``      : the checkpointed, resumable multi-stage pipeline runner with
  per-stage lineage/metrics.
- ``streaming``  : Structured Streaming variants of record assembly.

Design: DataFrame/Catalyst everywhere; Python only inside Arrow-batched pandas
UDFs (no per-row Python); explicit repartition/salting ahead of the pair
self-join; every stage independently checkpointed and resumable.
"""

__version__ = "0.1.0"
