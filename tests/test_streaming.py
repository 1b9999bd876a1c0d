"""Structured Streaming ingest: incremental records via foreachBatch with
availableNow catch-up (entity_matching_spark/streaming/ingest.py)."""

import os

import pytest


class TestIncrementalIngest:
    def test_available_now_catchup(self, spark, transcripts_df, tmp_path):
        from entity_matching_spark.streaming.ingest import incremental_records

        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ck_dir = str(tmp_path / "ck")
        transcripts_df.limit(0).write.parquet(out_dir)  # schema-less seed dir ok
        import shutil

        shutil.rmtree(out_dir)

        sample = transcripts_df.where("conv_id < 'conv00000010'")
        sample.write.parquet(in_dir)

        q = incremental_records(spark, in_dir, out_dir, ck_dir)
        q.awaitTermination(120)

        got = spark.read.parquet(out_dir)
        n_conv = sample.select("conv_id").distinct().count()
        assert got.count() == n_conv
        assert "norm_legal_name" in got.columns

        # second availableNow run with no new files appends nothing
        q2 = incremental_records(spark, in_dir, out_dir, ck_dir)
        q2.awaitTermination(120)
        assert spark.read.parquet(out_dir).count() == n_conv


class TestStatefulAssembly:
    def test_cross_batch_session_gap(self, spark, tmp_path):
        """applyInPandasWithState: turns of one conversation arriving in
        DIFFERENT micro-batches merge in keyed state; the assembled document
        is emitted only after `gap` of event time passes with no new turn,
        and matches the batch E1 concatenation order."""
        import datetime as dt

        from entity_matching_spark.streaming.ingest import stateful_assembly

        import glob as globmod
        import shutil

        ddl = ("conv_id string, turn_idx int, role string, text string, "
               "tool string, ts timestamp")
        t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

        in_dir = tmp_path / "sin"
        in_dir.mkdir()

        def write_file(rows, name):
            # the streaming file source does not recurse into the directory a
            # DataFrame writer creates — stage then copy the flat part file
            stage = str(tmp_path / "sstage")
            spark.createDataFrame(rows, ddl).coalesce(1).write.mode("overwrite").parquet(stage)
            shutil.copy(globmod.glob(stage + "/part-*.parquet")[0], str(in_dir / name))

        # file 1: convA turns 0,1 + convB turn 0
        write_file([
            ("convA", 0, "user", "a-zero", None, t0),
            ("convA", 1, "assistant", "a-one", None, t0 + dt.timedelta(minutes=1)),
            ("convB", 0, "user", "b-zero", None, t0 + dt.timedelta(minutes=1)),
        ], "f1.parquet")
        # file 2: convA turn 2 (cross-batch merge for A)
        write_file([
            ("convA", 2, "assistant", "a-two", None, t0 + dt.timedelta(minutes=2)),
        ], "f2.parquet")
        # file 3: watermark pusher far in the future -> A and B time out;
        # convZ itself stays in state (its own timeout is beyond the data)
        write_file([
            ("convZ", 0, "user", "z-zero", None, t0 + dt.timedelta(hours=2)),
        ], "f3.parquet")

        out_dir = str(tmp_path / "sout")
        q = stateful_assembly(
            spark, str(in_dir), out_dir, str(tmp_path / "sck"),
            watermark="10 minutes", gap="5 minutes",
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)

        got = {r["conv_id"]: r for r in spark.read.parquet(out_dir).collect()}
        assert "convA" in got and "convB" in got
        assert got["convA"]["text"] == "a-zero\na-one\na-two"  # cross-batch order
        assert got["convA"]["n_turns"] == 3
        assert got["convB"]["text"] == "b-zero"
        assert "convZ" not in got  # still open: nothing advanced past its gap


class TestIncrementalMatch:
    def test_batch_vs_corpus_matching(self, spark, tmp_path):
        """Stream-static incremental matching: a later-arriving conversation
        must match an earlier batch's record via the persisted corpus keys;
        conversations inside one batch also pair with each other."""
        import datetime as dt
        import glob as globmod
        import shutil

        from entity_matching_spark.streaming.ingest import incremental_match

        ddl = ("conv_id string, turn_idx int, role string, text string, "
               "tool string, ts timestamp")
        t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
        in_dir = tmp_path / "min"
        in_dir.mkdir()

        def write_file(rows, name):
            stage = str(tmp_path / "mstage")
            spark.createDataFrame(rows, ddl).coalesce(1).write.mode("overwrite").parquet(stage)
            shutil.copy(globmod.glob(stage + "/part-*.parquet")[0], str(in_dir / name))

        blurb = "Legal Name: Quiet Timber Works LLC\nMEI: US00000011"
        # batch 1: two conversations sharing the MEI -> intra-batch pair
        write_file([
            ("convA1", 0, "user", blurb, None, t0),
            ("convA2", 0, "user", blurb, None, t0),
        ], "b1.parquet")
        # batch 2: one new conversation with the same MEI -> cross-batch pairs
        write_file([
            ("convB", 0, "user", blurb, None, t0 + dt.timedelta(minutes=1)),
        ], "b2.parquet")

        wd = str(tmp_path / "mwork")
        q = incremental_match(spark, str(in_dir), wd, max_files_per_trigger=1)
        q.awaitTermination(240)

        matches = spark.read.parquet(wd + "/matches")
        got = {
            tuple(sorted((r["conv_id_a"], r["conv_id_b"]))): r["strategy"]
            for r in matches.collect()
        }
        assert got[("convA1", "convA2")] == "IDENTIFIER"   # intra-batch
        assert got[("convA1", "convB")] == "IDENTIFIER"    # cross-batch
        assert got[("convA2", "convB")] == "IDENTIFIER"
        # corpus accumulated all three records + their keys
        assert spark.read.parquet(wd + "/records").count() == 3
        assert spark.read.parquet(wd + "/keys").select("conv_id").distinct().count() == 3

        # restart with no new input: no duplicate appends (per-batch
        # partition overwrite keeps the tables replay-stable)
        q2 = incremental_match(spark, str(in_dir), wd, max_files_per_trigger=1)
        q2.awaitTermination(120)
        assert spark.read.parquet(wd + "/records").count() == 3
        assert spark.read.parquet(wd + "/matches").count() == matches.count()
