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

from ..functions.javaspace import not_blank_line

# scala.io.Source.getLines / BufferedReader.readLine line terminators:
# \r\n (one terminator — listed first), lone \r, lone \n. NOT \x85 or
# U+2028/U+2029 (those are Java-regex-`.` terminators only; a \x85 in a
# value reaches the statement patterns and is a reference crash shape —
# functions/parse.py). Used by both the file reader and the packed-cell
# exploder so a record handed to the parse kernels is always
# \n-delimited.
_LINE_TERM = r"\r\n|\r|\n"


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
            # line split = scala.io.Source.getLines (FileReader.scala:19)
            # = BufferedReader.readLine terminators \r\n, \r, \n — a
            # lone-\r (classic-Mac) log is many lines to the reference,
            # probed vs the binary (fuzz axis `crlf`); \r\n first so the
            # pair is ONE terminator. Blank-line drop is String.isBlank
            # — a wider set than trim()=='' (e.g. a 　-only line is
            # blank to it, an NBSP-only line is NOT) — javaspace.py
            F.split(F.col("value"), _LINE_TERM),
            not_blank_line,
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


def explode_log_records(
    docs: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Multi-statement documents → one row per 2-line record, with the
    reference's exact pairing semantics (blank lines dropped, remaining
    lines grouped in pairs — FileParser.scala:22), as pure expressions.

    For a documents table whose text cells batch several redo records,
    run this BEFORE parse_documents / parse_documents_sql. Every other
    column is carried unchanged (an exploded record inherits its doc's
    warc_ts; the parse extracts the per-record ts from the chunk).
    `id_col` gains a zero-padded '#kkkk' position suffix so
    (warc_ts, url) ordering inside a doc equals record order. An odd
    trailing line yields a one-line record the parse kernel flags
    (missing id line) — the reference CRASHES there (chunk(1) index
    error); this repo's policy turns reference crashes into observable
    rejects. All-blank or empty text cells yield no rows (filterNot
    semantics).

    ORDERING CONTRACT: downstream incarnation/discovery order is
    (parsed ts, url). Exploding preserves statement order exactly when
    doc urls sort in packing order within every equal-ts tie (e.g. one
    zero-padded sequence space, as tests/fuzzgen.records_to_packed_
    documents builds). Packing that straddles an equal-ts tie whose
    urls come from DIFFERENT lexicographic ranges (multi-host bursts)
    re-breaks that tie by the packed doc's base url — same multiset of
    events, possibly different incarnation split within the tie. That
    is inherent to any url-rewriting step, not specific to this one."""
    other = [c for c in docs.columns if c != text_col]
    staged = docs.select(
        *other,
        # named array column: the chunking transform references it
        # repeatedly and interpreted Projects have no CSE (PLANS §10)
        F.filter(
            # getLines terminator set (see _LINE_TERM): a packed cell
            # written with \r\n or lone-\r records explodes identically
            F.split(F.col(text_col), _LINE_TERM), not_blank_line
        ).alias("__lines"),
    )
    chunks = F.expr(
        # same guarded pairing as read_log_files (sequence(0,-1) would
        # DESCEND; get() keeps the orphan's missing second line NULL,
        # which concat_ws drops)
        "case when size(__lines) = 0 then array() else "
        "transform(sequence(0, int(ceil(size(__lines)/2)) - 1),"
        " i -> struct(i as seq,"
        " concat_ws('\\n', get(__lines, 2*i), get(__lines, 2*i+1)) as text))"
        " end"
    )
    ex = staged.select(*other, F.explode(chunks).alias("__c"))
    out_cols = []
    for c in docs.columns:
        if c == text_col:
            out_cols.append(F.col("__c.text").alias(text_col))
        elif c == id_col:
            out_cols.append(
                F.concat_ws(
                    "#", F.col(id_col),
                    F.format_string("%04d", F.col("__c.seq")),
                ).alias(id_col)
            )
        else:
            out_cols.append(F.col(c))
    return ex.select(*out_cols)
