import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("entity-matching-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-Xss32m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    from entity_matching_spark.sources.synth import generate_corpus

    return generate_corpus(n_families=60, chain_families=4, p10_families=6)


@pytest.fixture(scope="session")
def transcripts_df(spark, small_corpus):
    from entity_matching_spark.sources.synth import transcripts_to_spark

    t, _ = small_corpus
    return transcripts_to_spark(spark, t).cache()


@pytest.fixture(scope="session")
def records_df(spark, transcripts_df):
    from entity_matching_spark.operators.assemble import build_records

    return build_records(transcripts_df).cache()
