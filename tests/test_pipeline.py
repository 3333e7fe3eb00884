"""End-to-end: fan-out routing counts, lineage resume, logfile-source
parity, enrichment, streaming variant."""

import os

import pytest
from pyspark.sql import functions as F

from redo_log_parser_spark import oracle
from redo_log_parser_spark.config import PipelineConfig
from redo_log_parser_spark.fixtures import enrichment_dims, mini_log_lines
from redo_log_parser_spark.functions.parse import parse_documents
from redo_log_parser_spark.pipeline import enrich, run_pipeline
from redo_log_parser_spark.sinks.lineage import run_resumable, completed_buckets
from redo_log_parser_spark.sources.logfile import read_log_files
from redo_log_parser_spark.operators.rowid import uniquify_row_ids


def test_full_pipeline_counts_and_traces(spark, mini_docs, tmp_path):
    out = str(tmp_path / "out")
    td, lm = enrichment_dims()
    cfg = PipelineConfig(root_class='"SYSTEM"."ORDERS"')
    res = run_pipeline(
        mini_docs, out, cfg,
        table_dict=spark.createDataFrame(td),
        lang_map=spark.createDataFrame(lm),
    )
    assert res.routed_counts["sink_insert"] == 161
    assert res.routed_counts["sink_update"] == 220
    assert res.routed_counts["sink_delete"] == 52
    assert res.routed_counts["sink_rejects"] == 0
    # one trace per ORDERS entity: 70 (60 + 10 reused-rowid re-inserts)
    assert res.n_traces == 70
    # routed sink re-reads partition-pruned
    ins = spark.read.parquet(f"{out}/events_by_op").filter(F.col("op") == "insert")
    assert ins.count() == 161
    # enrichment columns came through the broadcast joins
    assert "clean_name" in ins.columns and "lang_name" in ins.columns
    # XES trace sink exists and is non-empty XML
    xes = spark.read.parquet(f"{out}/traces_xes")
    row = xes.first()
    assert row["trace_xml"].startswith("<trace><event>")


def test_unknown_root_class_rejected(spark, mini_docs, tmp_path):
    cfg = PipelineConfig(root_class="NOPE")
    with pytest.raises(ValueError, match="root class"):
        run_pipeline(mini_docs, str(tmp_path / "o2"), cfg, write_sinks=False)


def test_lineage_resume(spark, mini_docs, tmp_path):
    out = str(tmp_path / "lineage_out")
    calls = []

    def process(bucket_df, bucket_out):
        n = bucket_df.count()
        calls.append(n)
        return {"rows_in": n, "rows_clean": n, "rows_reject": 0}

    r1 = run_resumable(mini_docs, out, process, n_buckets=4, run_id="r1")
    assert len(r1) == 4
    assert sum(e["rows_in"] for e in r1) == 433
    assert completed_buckets(spark, out) == {0, 1, 2, 3}
    # resume: nothing left to do, processor not called again
    before = len(calls)
    r2 = run_resumable(spark.createDataFrame(mini_docs.toPandas()), out, process,
                       n_buckets=4, run_id="r2")
    assert r2 == [] and len(calls) == before


def test_logfile_source_matches_documents_mode(spark, tmp_path):
    """Raw-file parity: reading the blank-line-separated file format must
    yield the same parsed statements as the documents mode."""
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    (log_dir / "redo_log.txt").write_text("\n".join(mini_log_lines()))
    docs = read_log_files(spark, str(log_dir))
    parsed = parse_documents(docs, keep_cols=("url",))
    got = parsed.groupBy("op").count().collect()
    assert {r["op"]: r["count"] for r in got} == {
        "insert": 161, "update": 220, "delete": 52}
    # ordering: urls are zero-padded so (ts, url) is file order; check a
    # reused-rowid incarnation appears just as in documents mode
    events = uniquify_row_ids(parsed)
    n_incarnated = events.filter(F.col("row_id").contains("#")).count()
    assert n_incarnated > 0


def test_reference_artifact_through_spark(spark):
    """The reference's own sample log through the whole Spark parse path:
    counts must match README.md:69 (433 entries: 161/220/52)."""
    docs = read_log_files(spark, "/root/reference/artifacts/redo_log.txt")
    parsed = parse_documents(docs, keep_cols=("url",))
    counts = {r["op"]: r["count"] for r in parsed.groupBy("op").count().collect()}
    assert counts == {"insert": 161, "update": 220, "delete": 52}
    assert parsed.filter(F.col("parse_error").isNotNull()).count() == 0


def test_streaming_route(spark, mini_docs, tmp_path):
    from redo_log_parser_spark.streaming.stream import (
        parse_stream, stream_documents, streaming_route)

    src = str(tmp_path / "stream_src")
    mini_docs.write.mode("overwrite").parquet(src)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_documents(spark, src)
    assert stream.isStreaming
    q = streaming_route(parse_stream(stream), out, ckpt)
    q.awaitTermination(120)
    routed = spark.read.parquet(f"{out}/events_by_op")
    got = {r["op"]: r["count"] for r in routed.groupBy("op").count().collect()}
    assert got == {"insert": 161, "update": 220, "delete": 52}


def test_multi_root_single_parse(spark, mini_docs, tmp_path):
    """The reference's interactive loop (Main.scala:131-162) re-expressed:
    several --root-class values share ONE parse + discovery pass and get
    one XES sink each."""
    out = str(tmp_path / "multiroot")
    cfg = PipelineConfig(root_classes=('"SYSTEM"."ORDERS"', '"SYSTEM"."USERS"'))
    res = run_pipeline(mini_docs, out, cfg)
    assert set(res.n_traces_by_root) == {'"SYSTEM"."ORDERS"', '"SYSTEM"."USERS"'}
    assert res.n_traces_by_root['"SYSTEM"."ORDERS"'] == 70
    assert res.n_traces == sum(res.n_traces_by_root.values())
    for sub in ("SYSTEM_._ORDERS", "SYSTEM_._USERS"):
        xes = spark.read.parquet(f"{out}/traces_xes/{sub}")
        assert xes.count() > 0
        assert xes.first()["trace_xml"].startswith("<trace><event>")


def test_strict_flag_forwarded_to_discovery(spark, mini_docs, tmp_path):
    """cfg.strict_primary_keys must reach discover_schema (ADVICE r1):
    strict runs mark is_pk only for increasing, PK-named, duplicate-free
    columns — a strictly smaller (or equal, here: smaller) set."""
    lenient = run_pipeline(
        mini_docs, str(tmp_path / "s0"), PipelineConfig(), write_sinks=False
    ).schema.pk_candidates()
    strict = run_pipeline(
        mini_docs, str(tmp_path / "s1"),
        PipelineConfig(strict_primary_keys=True), write_sinks=False,
    ).schema.pk_candidates()
    assert strict <= lenient
    assert strict != lenient, "strict must actually constrain the PK set"


def test_logfile_orphan_line_becomes_reject(spark, tmp_path):
    """A file with an odd number of non-blank lines: the reference crashes
    on the 1-element chunk (FileParser.scala chunk(1)); the repo policy
    converts crashes into observable rejects — the orphan must flow
    through as missing_id_line, not vanish."""
    log_dir = tmp_path / "oddlogs"
    log_dir.mkdir()
    (log_dir / "odd.txt").write_text(
        'insert into "S"."T"("ID") values (\'1\');\n'
        "AAAX 01-JAN-2020 00:00:00\n"
        "\n"
        'insert into "S"."T"("ID") values (\'2\');\n'
    )
    docs = read_log_files(spark, str(log_dir))
    assert docs.count() == 2
    parsed = parse_documents(docs, keep_cols=("url",))
    errs = [r["parse_error"] for r in parsed.collect() if r["parse_error"]]
    assert errs == ["missing_id_line"]


def test_xes_document_per_root_and_console_schema(spark, mini_docs, tmp_path):
    """cfg.xes_document writes the reference-style <root>_result.xes per
    root (Main.scala:149-153); format_console renders Table/Column
    toString lines."""
    import xml.etree.ElementTree as ET

    out = str(tmp_path / "xdoc")
    cfg = PipelineConfig(root_class='"SYSTEM"."ORDERS"', xes_document=True)
    res = run_pipeline(mini_docs, out, cfg)
    doc = f"{out}/SYSTEM_._ORDERS_result.xes"
    root = ET.parse(doc).getroot()
    ns = "{http://www.xes-standard.org/}"
    assert len(root.findall(f"{ns}trace")) == res.n_traces == 70
    with open(doc, encoding="utf-8") as fh:
        first = fh.readline()
    assert first == "<?xml version='1.0' encoding='UTF-8'?>\n"

    dump = res.schema.format_console()
    assert 'TABLE "SYSTEM"."ORDERS"' in dump
    assert "ID (PRIMARY KEY) " in dump
    assert 'USER_ID FK CANDIDATE FOR: "SYSTEM"."USERS".ID' in dump
    strict_dump = res.schema.format_console(strict=True)
    assert "(STRONG PRIMARY KEY)" in strict_dump or "(PRIMARY KEY)" not in strict_dump


def test_safe_root_names_collision_proof():
    """Sanitizing is lossy ('"S"."T"' and 'S_._T' both map to 'S_._T');
    colliding roots must get DISTINCT sink names (hash suffix) while
    non-colliding roots keep the plain sanitized form (round-2 ADVICE)."""
    from redo_log_parser_spark.pipeline import _safe_root_names

    roots = ['"S"."T"', "S_._T", '"SYS"."ORDERS"']
    names = _safe_root_names(roots)
    assert len(set(names.values())) == 3
    assert names['"SYS"."ORDERS"'] == "SYS_._ORDERS"  # no collision → plain
    assert names['"S"."T"'] != names["S_._T"]
    assert all(n.startswith("S_._T") for r, n in names.items() if r != '"SYS"."ORDERS"')


def test_lineage_batched_resume_single_action(spark, mini_docs, tmp_path):
    """run_resumable_batched must process ALL pending buckets in one
    write job (plus O(1) bookkeeping jobs), keep per-bucket idempotence,
    and skip completed buckets exactly like the per-bucket loop."""
    from pyspark.sql import functions as F

    from redo_log_parser_spark.sinks.lineage import (
        record_lineage, run_resumable_batched,
    )

    out = str(tmp_path / "batched_out")
    # pre-mark buckets 0 and 3 done (simulating a prior partial run)
    for b in (0, 3):
        record_lineage(out, {
            "bucket": b, "status": "ok", "rows_in": 0, "rows_clean": 0,
            "rows_reject": 0, "wall_sec": 0.0, "run_id": "r0",
        })

    def transform(df):
        return df.select("url", "bucket", F.length("text").alias("n_chars"))

    sc = spark.sparkContext
    sc.setJobGroup("batched-resume", "batched lineage resume")
    try:
        r1 = run_resumable_batched(
            mini_docs, out, transform, n_buckets=16, run_id="r1")
    finally:
        sc.setJobGroup(None, None)
    # 14 pending buckets resumed by an O(1) number of jobs (1 write +
    # 1 read-back count + AQE/file-listing extras), NOT one per bucket
    jobs = sc.statusTracker().getJobIdsForGroup("batched-resume")
    assert 1 <= len(jobs) <= 6, jobs
    assert sorted(e["bucket"] for e in r1) == [b for b in range(16) if b not in (0, 3)]
    assert completed_buckets(spark, out) == set(range(16))
    written = spark.read.parquet(f"{out}/data")
    n_written = written.count()
    assert n_written == sum(e["rows_in"] for e in r1) > 0

    # fully resumed: nothing pending
    assert run_resumable_batched(
        mini_docs, out, transform, n_buckets=16, run_id="r2") == []

    # drop one bucket's lineage record -> exactly that bucket re-runs and
    # dynamic overwrite touches only its own partition (total unchanged)
    import glob, os
    victim = glob.glob(f"{out}/_lineage/bucket_00005_*.json")
    for f in victim:
        os.remove(f)
    r3 = run_resumable_batched(
        mini_docs, out, transform, n_buckets=16, run_id="r3")
    assert [e["bucket"] for e in r3] == [5]
    assert spark.read.parquet(f"{out}/data").count() == n_written

    # transform that loses the bucket column is rejected loudly
    with pytest.raises(ValueError, match="bucket"):
        run_resumable_batched(
            mini_docs, str(tmp_path / "other"),
            lambda df: df.select("url"), n_buckets=2)


def test_lineage_batched_manifest_honesty(spark, mini_docs, tmp_path):
    """The batched manifest must be derived, not faked (round-3 VERDICT
    #3): rows_clean/rows_reject split by parse_error nullity per bucket,
    wall_sec = the one shared job wall (identical on every entry, with
    job_buckets recording how many shared it)."""
    from redo_log_parser_spark.functions.parse import parse_documents
    from redo_log_parser_spark.sinks.lineage import run_resumable_batched

    out = str(tmp_path / "honest_out")
    # corrupt a deterministic slice so some buckets carry real rejects
    docs = mini_docs.withColumn(
        "text",
        F.when(F.xxhash64("url") % 5 == 0, F.lit("not a redo statement"))
        .otherwise(F.col("text")),
    )

    def transform(df):
        return parse_documents(
            df, keep_cols=("url", "warc_ts", "lang", "bucket")
        ).select("url", "bucket", "op", "parse_error")

    entries = run_resumable_batched(docs, out, transform, n_buckets=4)
    assert len(entries) == 4
    got = spark.read.parquet(f"{out}/data")
    by_bucket = {
        r["bucket"]: (r["n"], r["n_rej"])
        for r in got.groupBy("bucket").agg(
            F.count("*").alias("n"),
            F.sum(F.col("parse_error").isNotNull().cast("long")).alias("n_rej"),
        ).collect()
    }
    assert sum(rej for _n, rej in by_bucket.values()) > 0  # fixture bites
    for e in entries:
        n, rej = by_bucket[e["bucket"]]
        assert e["rows_in"] == n
        assert e["rows_reject"] == rej
        assert e["rows_clean"] == n - rej
        assert e["job_buckets"] == 4
    walls = {e["wall_sec"] for e in entries}
    assert len(walls) == 1 and walls.pop() > 0  # one shared job wall


def test_lineage_batched_crash_between_write_and_append(spark, mini_docs, tmp_path):
    """Crash injection: the driver dies AFTER the data write but with
    only part of the lineage appended -> a re-run resumes exactly the
    unrecorded buckets and the written data is byte-stable (dynamic
    partition overwrite rewrites only those buckets)."""
    from redo_log_parser_spark.sinks import lineage as L

    out = str(tmp_path / "crash_out")

    def transform(df):
        return df.select("url", "bucket", F.length("text").alias("n_chars"))

    real_record = L.record_lineage
    calls = {"n": 0}

    def dying_record(out_dir, entry):
        if calls["n"] >= 3:
            raise RuntimeError("injected crash after 3 lineage appends")
        calls["n"] += 1
        real_record(out_dir, entry)

    L.record_lineage = dying_record
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            L.run_resumable_batched(
                mini_docs, out, transform, n_buckets=8, run_id="r1")
    finally:
        L.record_lineage = real_record

    done = completed_buckets(spark, out)
    assert len(done) == 3                      # the appends that landed
    data_before = sorted(
        (r["url"], r["bucket"], r["n_chars"])
        for r in spark.read.parquet(f"{out}/data").collect())

    r2 = L.run_resumable_batched(
        mini_docs, out, transform, n_buckets=8, run_id="r2")
    assert sorted(e["bucket"] for e in r2) == sorted(set(range(8)) - done)
    assert completed_buckets(spark, out) == set(range(8))
    data_after = sorted(
        (r["url"], r["bucket"], r["n_chars"])
        for r in spark.read.parquet(f"{out}/data").collect())
    assert data_after == data_before           # idempotent re-write


def test_verbose_entry_dumps(spark, mini_docs, capsys):
    """--verbose analogue of the reference's printEntries /
    printParsedLogEntries / printTransformedLogEntries
    (cli/package.scala:23-53): all three reference headers appear, with
    n-row heads rather than full dumps."""
    from redo_log_parser_spark.pipeline import print_verbose_entries

    print_verbose_entries(mini_docs, source="/tmp/mini.parquet", n=5)
    out = capsys.readouterr().out
    assert "Read following log entries from /tmp/mini.parquet:" in out
    assert "Extracted the following statements out of the log entries:" in out
    assert ("Transformed the following log entries and their row "
            "identifiers:") in out
    assert "only showing top 5 rows" in out
