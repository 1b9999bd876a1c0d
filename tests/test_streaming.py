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
