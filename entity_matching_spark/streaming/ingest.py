"""Incremental transcript ingestion via Structured Streaming.

The reference is single-shot batch (EntityMatchingApplication.java:225-280 —
no streaming anywhere, SURVEY.md §2 'explicit absences'), and the north rule
asks for *checkpoint-resumable batch*, which plans/pipeline.py provides. This
module is the incremental complement for continuously-arriving transcripts:

- `incremental_records`: readStream over the transcripts table/directory ->
  foreachBatch -> per-batch S1 record assembly appended to the records table.
  Conversations are only assembled once complete (watermark on `ts` bounds
  how long we wait for late turns); each micro-batch processes only the
  conversations whose last turn falls inside the batch window. Assumes each
  arriving file carries whole conversations.
- `stateful_assembly`: the CROSS-BATCH case — turns of one conversation may
  arrive in different micro-batches. A custom stateful operator
  (applyInPandasWithState, event-time timeout) accumulates each
  conversation's turns in keyed state and emits the assembled document only
  after no new turn has arrived for ``gap`` of event time (session-gap
  semantics); late turns inside the watermark are merged in arrival-
  independent (turn_idx, text)-sorted order, so the output text is identical
  to the batch path's E1 concatenation.

At 10^12-turn scale the batch pipeline remains the primary path (bounded,
resumable, rerunnable); streaming ingestion keeps the records table warm
between batch recomputes. Uses trigger=availableNow for catch-up semantics,
so the same code serves both backfill and tail-following.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, MatchConfig

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def incremental_records(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    config: MatchConfig | None = None,
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Stream transcript turn files -> append assembled records.

    Grouping a stream by conv_id requires complete-conversation semantics:
    we watermark on `ts` and aggregate turns per conversation in update mode
    inside foreachBatch (each arriving file carries whole conversations in
    this pipeline's layout — the common case for conversation logs dumped by
    upstream agents; cross-file conversations are reconciled by the batch
    recompute path).
    """
    cfg = config or DEFAULT_CONFIG
    from ..operators.assemble import build_records

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL).parquet(input_path)
        .withWatermark("ts", watermark)
    )

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        records = build_records(batch_df, cfg)
        # foreachBatch is at-least-once: a replayed micro-batch under plain
        # mode('append') double-appends. Deterministic per-batch partition
        # overwrite makes the replay a no-op rewrite (same discipline as
        # incremental_match._write); readers see batch_id as a discovered
        # partition column.
        records.write.mode("overwrite").parquet(f"{output_path}/batch_id={batch_id}")

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# output/state schemas for the stateful assembler
ASSEMBLED_DDL = "conv_id string, text string, n_turns int"
_STATE_DDL = "turn_idx array<int>, text array<string>, max_ts_ms bigint"


def _gap_to_ms(gap: str) -> int:
    n, unit = gap.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60000, "minutes": 60000,
            "hour": 3600000, "hours": 3600000}[unit]
    return int(n) * mult


def stateful_assembly(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
    gap: str = "5 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Cross-batch conversation assembly via applyInPandasWithState.

    Per-conversation keyed state holds the turns seen so far; a conversation
    is emitted once its event-time timeout fires — ``gap`` past the
    conversation's last-seen turn timestamp (bounded below by the current
    watermark, as required by the state API). Output rows match the batch
    E1 assembly: turns sorted by (turn_idx, text), newline-joined.

    The per-group state is O(conversation size) and sharded by conv_id
    across executors — the streaming analog of the groupBy shuffle in the
    batch path. State survives restarts via the checkpoint location.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _gap_to_ms(gap)

    def assemble(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            turn_idx, texts, _max_ts = state.get
            order = sorted(range(len(texts)), key=lambda i: (turn_idx[i], texts[i]))
            doc = "\n".join(texts[i] for i in order)
            state.remove()
            yield pd.DataFrame(
                {"conv_id": [key[0]], "text": [doc], "n_turns": [len(texts)]}
            )
            return
        turn_idx, texts, max_ts = (list(state.get[0]), list(state.get[1]), state.get[2]) \
            if state.exists else ([], [], 0)
        for pdf in pdf_iter:
            turn_idx.extend(int(x) for x in pdf["turn_idx"])
            texts.extend(str(x) for x in pdf["text"])
            batch_max = int(pdf["ts"].astype("int64").max() // 1_000_000)
            max_ts = max(max_ts, batch_max)
        state.update((turn_idx, texts, max_ts))
        # fire `gap` after the last-seen turn; the API requires the timeout
        # to sit beyond the current watermark
        state.setTimeoutTimestamp(max(max_ts + gap_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({"conv_id": [], "text": [], "n_turns": []})

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
    )
    if max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    src = stream.parquet(input_path).withWatermark("ts", watermark)

    out = src.groupBy("conv_id").applyInPandasWithState(
        assemble,
        outputStructType=ASSEMBLED_DDL,
        stateStructType=_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Probe a path through Spark's Hadoop filesystem layer.

    A driver-local ``os.path.exists`` is always False for non-local work
    dirs (s3://, hdfs://), which would silently skip batch-vs-corpus
    matching forever — wrong results with no error. The Hadoop FS resolves
    whatever scheme the path carries.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def incremental_match(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    config: MatchConfig | None = None,
    watermark: str = "10 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuous matching: every micro-batch of transcript turns is
    assembled into records and matched against the ACCUMULATED corpus.

    Per batch (foreachBatch; effectively-once: the streaming checkpoint
    gives at-least-once batch execution and every write lands in a
    deterministic per-batch partition with overwrite, so replays rewrite
    instead of duplicating):

    1. assemble + extract the batch's conversations (build_records);
    2. blocking keys for the batch records — the corpus's keys are READ from
       the persisted keys table, not recomputed;
    3. candidate pairs = batch-vs-corpus cross join on shared keys
       (blocking.generate_cross_pairs — no corpus-corpus re-pairing) PLUS
       the batch's internal self-pairs (two new conversations can match
       each other);
    4. score_pairs over the PAIR PARTICIPANTS ONLY: the corpus records
       table is semi-joined to the pairs' conv_ids before any scoring, and
       the I13 ``shortname_dup`` input comes from an incrementally-updated
       ``key_counts`` table (per-batch deltas, summed on read) instead of a
       corpus-wide window — so every SHUFFLE in the scoring stage is
       O(batch-adjacent), never O(corpus). The remaining corpus-sized work
       per batch is the columnar parquet scan feeding the two semi-joined
       reads (keys for cross-pairing, records for side columns) — at scale
       that is the cost of not maintaining a key-value index, and the scan
       prunes to the selected columns;
    5. write the batch's matches, records, keys, and key-count deltas to
       their per-batch partitions.

    The sorted-neighborhood pass is excluded (it needs a global sort — that
    is the batch-recompute path's job); identifier/name-token/email keys are
    incremental by construction. Output tables under ``work_dir``:
    ``records``, ``keys``, ``matches``, ``key_counts``.
    """
    from ..operators.assemble import build_records
    from ..operators.blocking import generate_blocking_keys, generate_cross_pairs, generate_pairs
    from ..operators.score import SIDE_COLS, score_pairs
    from ..plans.pipeline import SCORED_COLS

    cfg = config or DEFAULT_CONFIG
    from dataclasses import replace

    cfg = replace(
        cfg,
        blocking_passes=tuple(p for p in cfg.blocking_passes if p != "sorted_neighborhood"),
    )
    # plain string joins, not os.path.join: the work dir may be a URI
    # (s3://, hdfs://) and these paths only ever cross the Hadoop FS layer
    records_path = f"{work_dir}/records"
    keys_path = f"{work_dir}/keys"
    matches_path = f"{work_dir}/matches"
    key_counts_path = f"{work_dir}/key_counts"

    def _write(df: DataFrame, base: str, batch_id: int):
        # Idempotent under micro-batch REPLAY: foreachBatch offers
        # at-least-once execution, so a plain append would double-write a
        # replayed batch. Writing each batch to its own deterministic
        # partition directory with overwrite makes the replay a no-op
        # rewrite; readers see batch_id as a discovered partition column
        # (dropped by the SIDE_COLS/SCORED_COLS projections).
        df.write.mode("overwrite").parquet(f"{base}/batch_id={batch_id}")

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        batch_records = build_records(batch_df, cfg).localCheckpoint()
        batch_keys = generate_blocking_keys(batch_records, cfg).localCheckpoint()
        # this batch's clean-name-key delta counts (I13 state increment)
        batch_counts = (
            batch_records.where(F.col("clean_name_key").isNotNull())
            .groupBy("clean_name_key").agg(F.count("*").alias("n"))
        )

        pairs, _dropped = generate_pairs(batch_keys, cfg)
        have_corpus = _fs_exists(spark, records_path)
        if have_corpus:
            # exclude any replayed copy of THIS batch from the corpus side
            corpus_keys = spark.read.parquet(keys_path).where(F.col("batch_id") != batch_id)
            cross, _dropped2 = generate_cross_pairs(batch_keys, corpus_keys, cfg)
            pairs = pairs.unionByName(cross).dropDuplicates(["conv_id_a", "conv_id_b"])
        pairs = pairs.localCheckpoint()  # pair set is reused for participants + scoring

        # restrict the sides table to PAIR PARTICIPANTS before any scoring
        # work — without this, _prepare_sides shuffles the whole corpus
        participants = (
            pairs.select(F.col("conv_id_a").alias("conv_id"))
            .unionByName(pairs.select(F.col("conv_id_b").alias("conv_id")))
            .distinct()
        )
        sides = batch_records.select(*SIDE_COLS)
        if have_corpus:
            corpus_sides = (
                spark.read.parquet(records_path)
                .where(F.col("batch_id") != batch_id).select(*SIDE_COLS)
            )
            sides = sides.unionByName(corpus_sides)
        sides = sides.join(participants, "conv_id", "semi")

        # I13 shortname_dup from the ACCUMULATED key counts (prior deltas +
        # this batch), not a corpus-wide window: same semantics as the batch
        # path's count-over-all-records, O(distinct keys) per batch
        counts = batch_counts
        if have_corpus and _fs_exists(spark, key_counts_path):
            prior = (
                spark.read.parquet(key_counts_path)
                .where(F.col("batch_id") != batch_id).select("clean_name_key", "n")
            )
            counts = (
                counts.unionByName(prior)
                .groupBy("clean_name_key").agg(F.sum("n").alias("n"))
            )
        dup_keys = counts.where(F.col("n") > 1).select(
            "clean_name_key", F.lit(True).alias("shortname_dup")
        )
        sides = sides.join(dup_keys, "clean_name_key", "left").withColumn(
            "shortname_dup", F.coalesce("shortname_dup", F.lit(False))
        )

        scored = score_pairs(sides, pairs, cfg)
        _write(scored.select(*SCORED_COLS), matches_path, batch_id)

        _write(batch_records, records_path, batch_id)
        _write(batch_keys, keys_path, batch_id)
        _write(batch_counts, key_counts_path, batch_id)

    stream = spark.readStream.schema(TRANSCRIPT_DDL)
    if max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    src = stream.parquet(input_path).withWatermark("ts", watermark)
    writer = src.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", f"{work_dir}/_stream_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
