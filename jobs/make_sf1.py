#!/usr/bin/env python
"""Deterministically synthesize an sf1 bench dataset from sf0.1.

Round-3 VERDICT #4: every perf claim rests on sf0.1, where several
queries are overhead-bound and host noise is large; one sf1 pin
(~2.5M flagship statements) anchors the constants the 100 TB
extrapolation depends on. No external data exists in this sandbox, so
sf1 is a pure deterministic 10x expansion of the driver-generated
sf0.1 tables (TESTDATA.md) — reproducible bit-for-bit with this job:

  python jobs/make_sf1.py [--out /root/repo/testdata_sf1]

Only the four tables bench.py consumes are scaled:

  orders      1.5M rows: o_orderkey' = o_orderkey*10 + r (keeps the %3
              op mix and the 12-char url padding), o_orderdate' += r
              minutes (per-entity insert<update<delete day gaps keep
              the (warc_ts, url) == statement-order invariant).
  documents   50k rows: doc_id' = doc_id*10 + r; replica r>0 suffixes
              every space-followed token with _r (space -> '_r '; the
              final token keeps no suffix, which still leaves every
              n>=2 shingle disjoint), so replicas share
              ZERO shingles with each other or the original — the
              near-dup/collision structure of sf0.1 is copied 10x
              DISJOINTLY and pair volume scales linearly (suffixing
              nothing would instead create 10-member near-dup families
              per doc and quadratic pair blowup — a different, heavier
              workload than the one being scaled).
  embeddings  20k rows: vec_id' = vec_id*10 + r; replica r rotates the
              vector left by r positions (norm-preserving, cosine
              structure decorrelated across replicas).
  events      1M rows: event_id' = event_id*10 + r, user_id' =
              user_id*10 + r (10x the users, identical per-user event
              sequences — entity count scales with rows, like a real
              crawl), ts' += r seconds.

Everything is column expressions over a 10-row replica frame crossJoin
— no RNG, no UDFs; re-running overwrites identical bytes mod parquet
metadata."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
FACTOR = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--tag", default="",
        help="REQUIRED (non-empty) when expanding an already-expanded "
        "dataset (e.g. sf1 -> sf10): the default transforms COMMUTE "
        "with themselves, so a second application creates byte-identical "
        "cross-replica twins — replica (0,9) == (9,0) for both the token "
        "suffix (_9 then nothing == nothing then _9) and the embedding "
        "rotation (rot 0+9 == rot 9+0) — collapsing the 'disjoint "
        "replicas' invariant into quadratic near-dup families (found by "
        "the sf10 pair-count blowup, BENCH/BASELINE.md). A tag switches "
        "the suffix alphabet to _<tag><r> and the embedding transform to "
        "a prefix sign-flip (flip first r elements — composes "
        "NON-commutatively with rotation; all level-1 x level-2 "
        "composites are distinct; norm-preserving).",
    )
    args = ap.parse_args()

    from redo_log_parser_spark.session import get_spark

    spark = get_spark("make-sf1", master="local[32]",
                      confs={"spark.sql.shuffle.partitions": "32"})
    reps = spark.range(FACTOR).select(F.col("id").cast("int").alias("__r"))

    orders = spark.read.parquet(f"{args.src}/orders.parquet")
    o = (
        orders.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") * FACTOR + F.col("__r"))
        .withColumn(
            "o_orderdate",
            F.col("o_orderdate")
            + F.col("__r") * F.expr("interval 1 minute"),
        )
        .drop("__r")
    )
    o.repartition(8).write.mode("overwrite").parquet(f"{args.out}/orders.parquet")

    docs = spark.read.parquet(f"{args.src}/documents.parquet")
    d = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"), " ",
                    F.concat(F.lit("_" + args.tag),
                             F.col("__r").cast("string"), F.lit(" ")),
                )
            ),
        )
        .withColumn("doc_id", F.col("doc_id") * FACTOR + F.col("__r"))
        .drop("__r")
    )
    d.repartition(8).write.mode("overwrite").parquet(f"{args.out}/documents.parquet")

    emb = spark.read.parquet(f"{args.src}/embeddings.parquet")
    if args.tag:
        # prefix sign-flip: norm-preserving, non-commutative with the
        # level-1 rotation, distinct for every (rotation, flip) pair
        rot = F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(1), F.size("embedding")),
                lambda x, i: F.when(i <= F.col("__r"), -x).otherwise(x),
            )
        )
    else:
        rot = F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
            F.concat(
                F.slice(F.col("embedding"), F.col("__r") + 1,
                        F.size("embedding") - F.col("__r")),
                F.slice(F.col("embedding"), F.lit(1), F.col("__r")),
            )
        )
    e = (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("embedding", rot)
        .withColumn("vec_id", F.col("vec_id") * FACTOR + F.col("__r"))
        .drop("__r")
    )
    e.repartition(4).write.mode("overwrite").parquet(f"{args.out}/embeddings.parquet")

    events = spark.read.parquet(f"{args.src}/events.parquet")
    ev = (
        events.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") * FACTOR + F.col("__r"))
        .withColumn("user_id", F.col("user_id") * FACTOR + F.col("__r"))
        .withColumn(
            "ts", F.col("ts") + F.col("__r") * F.expr("interval 1 second")
        )
        .drop("__r")
    )
    ev.repartition(8).write.mode("overwrite").parquet(f"{args.out}/events.parquet")

    for t in ("orders", "documents", "embeddings", "events"):
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
