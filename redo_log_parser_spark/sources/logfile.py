"""S2 — raw redo-log file source (parity mode for reference artifacts).

The reference reads the whole file into memory and pairs non-blank lines
(FileReader.scala:17-22, FileParser.scala:19-24). Line pairing needs
file-global context, so a naive spark.read.text cannot reconstruct
chunks across partition boundaries. Here each FILE is one unit: read
with `wholetext`, then one vectorized explode turns each file into
documents-shaped rows (url = file#<seq>, text = the 2-line record).
Redo logs are many-files-small (per-instance spool output), so per-file
parallelism is the natural partitioning; a single giant file would be
the degenerate case and is not the production path (the production
input is the documents table, SURVEY.md §2.1 S1).

The pairing itself is pure built-in expressions (filter + windowless
array ops) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_log_files(spark: SparkSession, path: str) -> DataFrame:
    """Return a documents-shaped frame (url, text) from raw redo-log
    text files: blank lines dropped, remaining lines paired in order
    (FileParser.scala:22). warc_ts/lang are absent — the parse kernel
    extracts ts from the record itself; `url` encodes (file, seq) and is
    zero-padded so (ts, url) ordering matches file order."""
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    lines = files.select(
        "file",
        F.filter(
            F.split(F.col("value"), "\n"),
            lambda ln: F.trim(ln) != "",
        ).alias("lines"),
    )
    # ceil, not floor: a file with an odd number of non-blank lines has a
    # trailing orphan statement with no id line. The reference crashes on
    # it (FileParser.scala chunk of size 1 → translateChunkToLogEntry
    # index error); this repo's policy converts reference crashes into
    # observable rejects, so the orphan flows through as a ONE-line
    # record the parse kernel flags (missing id line) instead of
    # silently vanishing.
    pairs = lines.select(
        "file",
        F.expr(
            # guard: sequence(0, -1) would DESCEND in Spark, fabricating
            # two junk chunks for an all-blank file — emit none instead
            # get() (not lines[idx]) so the orphan's missing second line
            # is NULL (ANSI mode throws on out-of-bounds [] access) —
            # concat_ws drops the NULL, yielding a one-line record
            "case when size(lines) = 0 then array() else "
            "transform(sequence(0, int(ceil(size(lines)/2)) - 1),"
            " i -> struct(i as seq,"
            " concat_ws('\\n', get(lines, 2*i), get(lines, 2*i+1)) as text))"
            " end"
        ).alias("chunks"),
    )
    return pairs.select(
        "file", F.explode("chunks").alias("c")
    ).select(
        F.concat_ws(
            "#", F.col("file"), F.format_string("%010d", F.col("c.seq"))
        ).alias("url"),
        F.col("c.text").alias("text"),
    )
