#!/usr/bin/env python
"""Maintenance entrypoint: compact the incremental-match corpus tables.

Folds the accumulated ``batch_id=*`` partitions under an incremental_match
work dir into hash-bucketed compacted tables (atomic MANIFEST cutover), so
each future micro-batch's corpus reads bucket-prune instead of scanning
every historical partition. MUST run while the ingest stream is stopped
(after a clean availableNow completion) — see
entity_matching_spark/streaming/ingest.compact_corpus.

    spark-submit --py-files dist/entity_matching_spark.zip \
        jobs/compact_corpus.py --work-dir /data/em_stream --buckets 256

Local smoke:

    python jobs/compact_corpus.py --work-dir /tmp/em_stream --prune-raw
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", required=True,
                    help="incremental_match work dir (holds records/keys/key_counts)")
    ap.add_argument("--buckets", type=int, default=64,
                    help="hash buckets per compacted table (pruning granularity)")
    ap.add_argument("--prune-raw", action="store_true",
                    help="delete the absorbed raw batch partitions and the "
                         "superseded compacted directory after the cutover")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("em-compact-corpus")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from entity_matching_spark.streaming.ingest import compact_corpus

    stats = compact_corpus(
        spark, args.work_dir, n_buckets=args.buckets, prune_raw=args.prune_raw
    )
    print(json.dumps({"work_dir": args.work_dir, "n_buckets": args.buckets,
                      "tables": stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
