#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN —
the driver times the round-start copy; this file holds everything else).

Usage:
  python bench_extra.py time <query> [<query> ...]   # min-of-3, bench methodology
  python bench_extra.py explain <query> [out_file]   # .explain("formatted") dump
  python bench_extra.py noop <query> [<query> ...]   # noop-sink isolation (guide §1.4)

Respects SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS exactly like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from redo_log_parser_spark.session import get_spark

    return get_spark(
        "rlps-bench-extra",
        master=f"local[{CPUS}]",
        confs={"spark.sql.shuffle.partitions": str(int(CPUS))},
    )


def _queries():
    from bench import headline_queries

    return headline_queries()


def time_queries(names, action="count", trials=3):
    spark = _spark()
    qs = _queries()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).count()
        spark.catalog.clearCache()
        samples = []
        for i in range(trials):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    return out


def explain_query(name, out_file=None):
    spark = _spark()
    fn = _queries()[name]
    df = fn(spark, SF_DIR)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    if out_file:
        with open(out_file, "w") as fh:
            fh.write(txt)
        print(f"wrote {out_file}")
    else:
        print(txt)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "time":
        print(json.dumps(time_queries(sys.argv[2:])))
    elif cmd == "noop":
        print(json.dumps(time_queries(sys.argv[2:], action="noop")))
    elif cmd == "explain":
        explain_query(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown command {cmd}")
