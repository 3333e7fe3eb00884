"""Wide differential-fuzz sweep vs the real reference binary.

Runs tests/test_diff_fuzz.py's comparison for a seed range WITHOUT
pytest's fail-fast, collecting every divergence:

    python jobs/diff_fuzz_sweep.py --start 1000 --count 60

Prints one line per seed (ok / DIVERGED <stage>) and a summary; exits
non-zero if any seed diverged. Results of the round-3 sweep are
recorded in FIXTURES.md."""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests"))

from fuzzgen import write_fuzz_log  # noqa: E402
from refbin import (  # noqa: E402
    ensure_reference_build, parse_schema_dump, run_reference)

from redo_log_parser_spark.functions.parse import parse_documents  # noqa: E402
from redo_log_parser_spark.functions.xes import trace_xml_pretty  # noqa: E402
from redo_log_parser_spark.operators.rowid import uniquify_row_ids  # noqa: E402
from redo_log_parser_spark.operators.schema_discovery import (  # noqa: E402
    discover_schema, summarize_schema)
from redo_log_parser_spark.pipeline import build_traces_df  # noqa: E402
from redo_log_parser_spark.session import get_spark  # noqa: E402
from redo_log_parser_spark.sinks.xes import write_xes_document  # noqa: E402
from redo_log_parser_spark.sources.logfile import read_log_files  # noqa: E402


_TS_STYLE_PATTERN = {  # ts_style -> (--timestampPattern arg, engine cfg arg)
    "default": ("", ""),
    "mixedcase": ("", ""),  # default pattern parses months case-insensitively
    "iso": ("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ss"),
}


def check_seed(spark, seed: int, d: str, ts_style: str = "default") -> list[str]:
    """Return list of divergence labels (empty = clean)."""
    import re

    from redo_log_parser_spark.config import PipelineConfig

    trace_re = re.compile(r"[ ]*<trace>.*?</trace>", re.S)
    log = os.path.join(d, f"fuzz_{seed}.log")
    tables = write_fuzz_log(seed, log, ts_style=ts_style)
    root = tables[seed % len(tables)]
    bad: list[str] = []
    pat, cfg_fmt = _TS_STYLE_PATTERN[ts_style]
    cfg = PipelineConfig(ts_format_java=cfg_fmt) if cfg_fmt else PipelineConfig()

    ref_plain, ref_xes = run_reference(log, root, os.path.join(d, "r1.xes"),
                                       ts_pattern=pat)
    ref_strict, _ = run_reference(log, "-", os.path.join(d, "r2.xes"),
                                  ts_pattern=pat, strict=True)
    _, ref_xes_upd = run_reference(log, root, os.path.join(d, "r3.xes"),
                                   ts_pattern=pat, updvals=True)

    docs = read_log_files(spark, log)
    events = uniquify_row_ids(parse_documents(docs, cfg=cfg)).cache()
    try:
        if events.filter("parse_error is not null").count():
            bad.append("parse_error")

        # round 4: JVM expression parser rides every fuzz seed too —
        # payload columns + reject-ness must equal the pandas kernel
        # (labels may differ on degenerate rows, parse_sql docstring);
        # the ts-style axes also exercise its to_timestamp path
        from pyspark.sql import functions as F

        from redo_log_parser_spark.functions.parse_sql import (
            parse_documents_sql)

        cmp_cols = [
            "url", "op", "table_id", "row_id", "ts", "statement",
            "insert_cols", "insert_vals", "upd_attr", "upd_new",
            "upd_old", "delete_cols", "delete_vals",
        ]
        norm = lambda df: df.select(  # noqa: E731
            *cmp_cols, F.col("parse_error").isNotNull().alias("is_reject"))
        a = norm(parse_documents(docs, cfg=cfg))
        b = norm(parse_documents_sql(docs, cfg=cfg))
        if a.exceptAll(b).unionAll(b.exceptAll(a)).count():
            bad.append("sql_parser_parity")

        cols, ind = discover_schema(events, ind_mode="eager")
        schema = summarize_schema(cols, ind)
        if parse_schema_dump(schema.format_console()) != parse_schema_dump(ref_plain):
            bad.append("schema_plain")

        cols_s, ind_s = discover_schema(
            events, strict=True, ind_mode="eager", mono_mode="reference")
        if parse_schema_dump(
            summarize_schema(cols_s, ind_s).format_console(strict=True)
        ) != parse_schema_dump(ref_strict):
            bad.append("schema_strict")

        # round 4: byte-level dump parity via the pure-Python replica
        # (table/column/FK-target ORDER included)
        from redo_log_parser_spark import oracle

        lines = open(log, encoding="utf-8").read().splitlines()
        entries = oracle.uniquify_row_ids(
            oracle.parse_log_lines(lines, cfg))
        if oracle.reference_console_dump(entries) != ref_plain:
            bad.append("schema_plain_bytes")
        if oracle.reference_console_dump(entries, strict=True) != ref_strict:
            bad.append("schema_strict_bytes")

        from redo_log_parser_spark.sinks.xes import reference_trace_order

        order = reference_trace_order(events, root)
        for tag, upd, ref in (("xes", False, ref_xes),
                              ("xes_updvals", True, ref_xes_upd)):
            path = os.path.join(d, f"o_{tag}.xes")
            traces = build_traces_df(events, schema, root,
                                     include_update_values=upd)
            write_xes_document(trace_xml_pretty(traces), path, root,
                               pretty=True, case_order=order)
            got = open(path, encoding="utf-8").read()
            if not (
                got[:got.index("<trace>") - 2] == ref[:ref.index("<trace>") - 2]
                and got[got.rindex("</trace>"):] == ref[ref.rindex("</trace>"):]
                and sorted(trace_re.findall(got)) == sorted(trace_re.findall(ref))
            ):
                bad.append(tag)
            elif got != ref:
                # content identical, document-level trace ORDER diverged:
                # a scala_order replica miss — recorded separately
                bad.append(f"{tag}_order")
    finally:
        events.unpersist()
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=1000)
    ap.add_argument("--count", type=int, default=60)
    ap.add_argument("--ts-style", choices=sorted(_TS_STYLE_PATTERN),
                    default="default",
                    help="timestamp rendering axis: default pattern, "
                    "per-record mixed month casing, or ISO + "
                    "--timestampPattern on both sides")
    args = ap.parse_args()

    assert ensure_reference_build() is not None, "reference build unavailable"
    spark = get_spark("diff-fuzz-sweep", master="local[8]", confs={
        "spark.sql.shuffle.partitions": "8",
    })
    spark.sparkContext.setLogLevel("ERROR")

    failures: dict[int, list[str]] = {}
    errors: dict[int, str] = {}
    with tempfile.TemporaryDirectory() as d:
        for seed in range(args.start, args.start + args.count):
            try:
                bad = check_seed(spark, seed, d, ts_style=args.ts_style)
            except Exception:
                errors[seed] = traceback.format_exc(limit=3)
                print(f"seed {seed}: ERROR\n{errors[seed]}", flush=True)
                continue
            if bad:
                failures[seed] = bad
            print(f"seed {seed}: {'DIVERGED ' + ','.join(bad) if bad else 'ok'}",
                  flush=True)

    print(f"\nswept {args.count} seeds from {args.start} "
          f"(ts_style={args.ts_style}): "
          f"{len(failures)} diverged, {len(errors)} errored")
    for s, b in failures.items():
        print(f"  seed {s}: {b}")
    return 1 if (failures or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
