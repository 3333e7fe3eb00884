"""Pipeline configuration.

Mirrors the reference's CLI flags (cli/package.scala:14-20) plus the
scale-oriented knobs the Spark engine needs (salting, shuffle sizing,
checkpoint location).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Reference default: cli/package.scala:20 ("dd-MMM-yyyy HH:mm:ss").
DEFAULT_TS_FORMAT_JAVA = "dd-MMM-yyyy HH:mm:ss"

_JAVA_TO_STRPTIME = [
    ("yyyy", "%Y"),
    ("MMM", "%b"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("HH", "%H"),
    ("mm", "%M"),
    ("ss", "%S"),
]


def java_ts_format_to_strptime(java_fmt: str) -> str:
    """Translate the subset of java.time patterns the reference accepts
    (README.md:62-70 shows 'dd-MMM-yyyy HH:mm:ss' and
    'yyyy-MM-dd HH:mm:ss') into strptime format for the pandas kernel.

    Month-name matching is case-insensitive in both the reference
    (parser/package.scala:13-16, parseCaseInsensitive) and Python
    strptime, so no extra handling is needed.
    """
    out = java_fmt
    for java_tok, py_tok in _JAVA_TO_STRPTIME:
        out = out.replace(java_tok, py_tok)
    return out


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs for one pipeline run."""

    # --timestampPattern (cli/Main.scala flag; cli/package.scala:20)
    ts_format_java: str = DEFAULT_TS_FORMAT_JAVA
    # --includeUpdateValues (cli/package.scala:17): event names carry the
    # new value for updates (TraceIDParser.scala:124-127).
    include_update_values: bool = False
    # --strict (cli/package.scala:14): strong-PK check
    # (Column.scala:67-73,137-151).
    strict_primary_keys: bool = False
    # Root class(es) for trace building (replaces the interactive loop at
    # cli/package.scala:73-86 and Main.scala:131-162 — the reference asks
    # for roots repeatedly until --singleRun); validated against the
    # discovered schema. `root_class` is the single-root convenience;
    # `root_classes` runs several roots over ONE parse+discovery pass,
    # one trace sink per root.
    root_class: str | None = None
    root_classes: tuple[str, ...] = ()
    # IND semantics: False = final-state inclusion (repo default), True =
    # the reference's eager/latched fold (SchemaDeriver.scala:69-93);
    # identical on the shipped artifacts, divergent on adversarial logs
    # (tests/test_ind_semantics.py).
    eager_ind: bool = False
    # Also assemble one complete .xes document per root (the reference's
    # CLI output, '<out>/<root>_result.xes', PrettyPrinter layout) —
    # driver-side streaming assembly; for reference-CLI-sized outputs.
    xes_document: bool = False
    # Order traces in the .xes document exactly like the reference
    # binary: Scala 2.12 groupBy(HashMap) iteration over its seeded
    # random row-id suffixes, both replayed in pure Python
    # (functions/scala_order.py; sinks/xes.reference_trace_order).
    # False = deterministic case_id sort (repo default). Whole-file
    # byte equality against a reference .xes needs True.
    reference_trace_order: bool = False
    # Monotonicity semantics for strict-PK checks: False = real
    # log-order signal (the reference's documented intent), True =
    # constant-true, byte-faithful to the shipped binary whose
    # increasing check is vacuous (round-3 discovery — a List cons
    # extractor never matches HashMap.values.toSeq sliding windows,
    # Column.scala:104-124; see operators/schema_discovery.monotonicity).
    reference_monotonicity: bool = False

    # --- Spark-scale knobs (no reference equivalent) ---
    # Salt buckets for skewed trace collection (hot case_ids / hot hosts).
    n_salt: int = 16
    # Number of url-hash buckets used for checkpoint/lineage partitioning.
    n_url_buckets: int = 64
    # Where lineage / metrics / sink tables go.
    output_dir: str = "/tmp/redo_log_parser_spark_out"

    @property
    def all_root_classes(self) -> tuple[str, ...]:
        """root_classes if given, else (root_class,) if given, else ()."""
        if self.root_classes:
            return self.root_classes
        return (self.root_class,) if self.root_class is not None else ()

    @property
    def ts_format_strptime(self) -> str:
        return java_ts_format_to_strptime(self.ts_format_java)

    @property
    def ts_format_spark(self) -> str:
        """Spark's to_timestamp pattern; java.time-compatible already, but
        MMM month names are matched case-sensitively by Spark, so the
        vectorized kernel parses timestamps in pandas instead. Kept for
        sinks that re-format (always case-safe on output)."""
        return self.ts_format_java


DEFAULT_CONFIG = PipelineConfig()
