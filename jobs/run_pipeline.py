#!/usr/bin/env python
"""spark-submit driver for the full pipeline.

Cluster deployment (north rule):

  spark-submit \\
    --py-files rlps.zip \\
    --conf spark.sql.adaptive.enabled=true \\
    --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
    --conf spark.sql.files.maxPartitionBytes=128m \\
    jobs/run_pipeline.py \\
    --input <catalog>.documents --output s3://.../out \\
    --root-class '"SYSTEM"."ORDERS"' --buckets 4096 --run-id r1

Packaging: `python jobs/make_pyfiles.py` zips redo_log_parser_spark/
into rlps.zip for --py-files AT DEPLOY TIME (the zip is gitignored —
never committed, so it cannot go stale relative to the source tree).
Locally the package is importable from the repo root, so the same
script runs without the zip.

Resume: re-running with the same --output skips buckets already marked
ok in the lineage manifest (idempotent per-bucket overwrite).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redo_log_parser_spark.config import PipelineConfig
from redo_log_parser_spark.pipeline import run_pipeline
from redo_log_parser_spark.session import get_spark
from redo_log_parser_spark.sinks.lineage import run_resumable
from redo_log_parser_spark.sources.documents import read_documents


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or catalog table")
    ap.add_argument(
        "--input-format",
        choices=["documents", "logfile"],
        default="documents",
        help="documents = (url, warc_ts, html, text, lang) table; "
        "logfile = raw blank-line-separated redo logs like the "
        "reference CLI reads (parity mode)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--root-class", action="append", default=None,
        help="repeatable: each root gets its own trace sink from ONE "
        "parse+discovery pass (the reference's interactive multi-root "
        "loop, Main.scala:131-162)",
    )
    ap.add_argument("--timestamp-pattern", default="dd-MMM-yyyy HH:mm:ss")
    ap.add_argument("--include-update-values", action="store_true")
    ap.add_argument("--strict", action="store_true")
    ap.add_argument(
        "--eager-ind", action="store_true",
        help="reference-exact eager/latched IND semantics "
        "(SchemaDeriver.scala:69-93) instead of final-state inclusion",
    )
    ap.add_argument(
        "--reference-monotonicity", action="store_true",
        help="strict-PK fidelity mode: treat every column's values as "
        "increasing, matching the shipped reference binary whose "
        "monotonicity check is vacuously true (Column.scala:104-124 "
        "cons-pattern bug, verified against a real run — "
        "tests/fixtures/README.md); default computes the real "
        "log-order signal",
    )
    ap.add_argument(
        "--xes-file", action="store_true",
        help="also assemble one complete .xes document per root "
        "(<output>/<root>_result.xes, the reference CLI's output file, "
        "PrettyPrinter layout)",
    )
    ap.add_argument(
        "--reference-trace-order", action="store_true",
        help="with --xes-file: order traces exactly like the reference "
        "binary (Scala 2.12 groupBy-HashMap iteration over its seeded "
        "random row-id suffixes, both replayed in pure Python) so the "
        ".xes diffs byte-clean against a reference run; default sorts "
        "traces by case id",
    )
    ap.add_argument(
        "--verbose", action="store_true",
        help="dump n-row heads of the extracted / parsed / transformed "
        "entries under the reference's console headers "
        "(cli/package.scala:23-53; head instead of full dump — the "
        "honest Spark-scale equivalent)",
    )
    ap.add_argument(
        "--print-schema", action="store_true",
        help="print the discovered schema in the reference's console "
        "format (Table/Column.toString)",
    )
    ap.add_argument(
        "--reference-console-order", action="store_true",
        help="with --print-schema: emit the dump in the reference "
        "binary's exact byte order (Scala-HashMap table/column/"
        "FK-target iteration, replayed in pure Python and cross-checked "
        "against the engine's discovered sets); default sorts "
        "deterministically",
    )
    ap.add_argument(
        "--parser", choices=("pandas", "sql"), default="pandas",
        help="parse kernel: 'pandas' (default — the byte-parity Arrow "
        "reference kernel) or 'sql' (pure-JVM expression parser — no "
        "Python workers on the cluster; identical output on well-formed "
        "records, parity-pinned incl. hostile values, and measured "
        "FASTER end-to-end through this pipeline: sf1 2.5M rows 91 s "
        "pandas vs 77 s sql, hash-identical sinks; see PLANS.md §14)",
    )
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--no-resume", action="store_true",
                    help="process everything as one job (no bucket lineage)")
    ap.add_argument(
        "--explode-records", action="store_true",
        help="documents whose text cells batch SEVERAL 2-line redo "
        "records: un-pack them first with the reference's pairing "
        "(blank lines dropped, remaining lines grouped in pairs); url "
        "gains a '#kkkk' position suffix preserving (warc_ts, url) "
        "order. Fuzz-validated (diff_fuzz_sweep --axis packdoc)")
    args = ap.parse_args()

    spark = get_spark("rlps-pipeline")
    cfg = PipelineConfig(
        ts_format_java=args.timestamp_pattern,
        include_update_values=args.include_update_values,
        strict_primary_keys=args.strict,
        eager_ind=args.eager_ind,
        reference_monotonicity=args.reference_monotonicity,
        xes_document=args.xes_file,
        reference_trace_order=args.reference_trace_order,
        root_classes=tuple(args.root_class or ()),
        output_dir=args.output,
    )
    if args.input_format == "logfile":
        from redo_log_parser_spark.sources.logfile import read_log_files

        docs = read_log_files(spark, args.input)
    else:
        docs = read_documents(spark, args.input)
    if args.explode_records:
        from redo_log_parser_spark.sources.logfile import explode_log_records

        docs = explode_log_records(docs)

    def _reference_order_dump(docs, cfg, strict, res):
        """Byte-faithful reference console dump: pure-Python replay
        (oracle.reference_console_dump — binary-validated) over the
        collected log, cross-checked against the engine's discovered
        sets when the CLI modes match the reference's semantics
        (--eager-ind; --reference-monotonicity for strict)."""
        from redo_log_parser_spark import oracle

        # logfile-sourced docs carry no warc_ts column (the ts lives in
        # the text chunk); their zero-padded urls alone give file order
        order_cols = [c for c in ("warc_ts", "url") if c in docs.columns]
        sel = docs.select(*order_cols, "text")
        # one job: the limit both guards and collects (count()-then-
        # collect() would scan the input twice)
        rows = sel.orderBy(*order_cols).limit(1_000_001).collect()
        if len(rows) > 1_000_000:
            raise SystemExit(
                "--reference-console-order collects the whole input to "
                "the driver (> 1,000,000 rows); it replicates "
                "the reference CLI's console HashMap order and is meant "
                "for reference-CLI-sized logs only. Drop the flag to use "
                "the engine's sorted schema dump for large inputs."
            )
        entries = oracle.uniquify_row_ids(
            oracle.parse_records([r["text"] for r in rows], cfg))
        dump = oracle.reference_console_dump(entries, strict=strict)

        def canon(s):
            out, cur = {}, None
            for ln in s.splitlines():
                if not ln.strip():
                    continue
                if ln.startswith("TABLE "):
                    cur = ln[6:].strip()
                    out.setdefault(cur, set())
                    continue
                ln = ln.rstrip()
                m = "FK CANDIDATE FOR: "
                if m in ln:
                    head, tg = ln.split(m, 1)
                    ln = head + m + " AND ".join(sorted(tg.split(" AND ")))
                out[cur].add(ln)
            return out

        modes_match = cfg.eager_ind and (
            not strict or cfg.reference_monotonicity
        )
        if modes_match:
            ours = canon(res.schema.format_console(strict=strict))
            # explicit raise, not assert: this guard must survive
            # python -O / PYTHONOPTIMIZE (a divergence here means the
            # byte-faithful replica and the engine disagree — never
            # print an unflagged wrong dump)
            if canon(dump) != ours:
                raise ValueError(
                    "reference-order dump disagrees with the engine's "
                    "discovered schema — report this"
                )
        return dump

    if args.verbose:
        from redo_log_parser_spark.pipeline import print_verbose_entries

        print_verbose_entries(docs, cfg, source=args.input, parser=args.parser)

    if args.no_resume:
        res = run_pipeline(docs, args.output, cfg, parser=args.parser)
        if args.print_schema and res.schema is not None:
            # reference console dump incl. its header line
            # (cli/package.scala:58-66 — typo preserved verbatim)
            print(
                "\nExctracted the following database schema from "
                "transformed log entries:"
            )
            if args.reference_console_order:
                print(_reference_order_dump(docs, cfg, args.strict, res))
            else:
                print(res.schema.format_console(strict=args.strict))
        print({"routed": res.routed_counts, "traces": res.n_traces})
        return 0

    def process(bucket_df, bucket_out):
        res = run_pipeline(bucket_df, bucket_out, cfg, parser=args.parser)
        clean = sum(
            v for k, v in res.routed_counts.items() if k != "sink_rejects"
        )
        return {
            "rows_in": clean + res.routed_counts.get("sink_rejects", 0),
            "rows_clean": clean,
            "rows_reject": res.routed_counts.get("sink_rejects", 0),
        }

    entries = run_resumable(
        docs, args.output, process, n_buckets=args.buckets, run_id=args.run_id
    )
    print({"buckets_processed": len(entries)})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
