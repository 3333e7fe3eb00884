"""End-to-end batch pipeline: parse → enrich → route → aggregate.

Mirrors the reference CLI run (cli/Main.scala:103-155) re-planned for
Spark (SURVEY.md §3.1):

  1. parse          pandas-UDF kernel over documents.text (html pruned)
  2. uniquify       ROWID incarnation window
  3. enrich         broadcast dictionary joins (table names, lang names)
  4. route          fan-out sinks by op + rejects (single pass)
  5. discover       schema aggregates → driver summary (small)
  6. traces         entity edges → case propagation → salted collect
  7. serialize      per-trace XES XML strings → sink
  8. lineage        per-bucket metrics + resumable manifest

Steps 1-4 are embarrassingly parallel over url-hash buckets; 5-7 shuffle
on (table,col,row) / value / case keys. The parsed frame is cached once
and feeds both the routing write and the aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig, DEFAULT_CONFIG
from .functions.javaspace import java_equals_ignore_case
from .functions.parse import parse_documents
from .functions.parse_sql import parse_documents_sql
from .functions.xes import trace_xml, with_xes_columns
from .operators.rowid import uniquify_row_ids
from .operators.schema_discovery import discover_schema, summarize_schema, SchemaSummary
from .operators.traces import (
    assign_entries,
    collect_traces,
    entity_edges,
    propagate_cases,
    root_cases,
)
from .sinks.fanout import write_fanout


def enrich(events: DataFrame, table_dict: DataFrame | None = None,
           lang_map: DataFrame | None = None) -> DataFrame:
    """J4 — broadcast lookup joins (BASELINE.json north_star: schema /
    table-name dictionaries, lang maps). Dimensions are small by
    construction → forced broadcast, no shuffle of the event stream."""
    out = events
    if table_dict is not None:
        out = out.join(F.broadcast(table_dict), "table_id", "left")
    if lang_map is not None and "lang" in out.columns:
        out = out.join(F.broadcast(lang_map), "lang", "left")
    return out


def _safe_root_name(root: str) -> str:
    """Filesystem-safe sink suffix for a root class like '"SYS"."ORDERS"'."""
    import re

    return re.sub(r"[^A-Za-z0-9_.-]+", "_", root).strip("_")


def _safe_root_names(roots) -> dict[str, str]:
    """root → filesystem-safe sink suffix, collision-proof: sanitizing is
    lossy ('"S"."T"' and 'S_._T' both map to 'S_._T'), and a collision
    would silently overwrite one root's traces_xes dir and _result.xes.
    Colliding names get a short content hash suffix so every root keeps
    its own sink."""
    import hashlib

    base = {rc: _safe_root_name(rc) for rc in roots}
    counts: dict[str, int] = {}
    for name in base.values():
        counts[name] = counts.get(name, 0) + 1
    return {
        rc: (
            name
            if counts[name] == 1
            else f"{name}-{hashlib.md5(rc.encode()).hexdigest()[:8]}"
        )
        for rc, name in base.items()
    }


def print_verbose_entries(
    docs: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    source: str = "<input>",
    n: int = 20,
    parser: str = "pandas",
) -> None:
    """`--verbose` analogue of the reference's per-entry console dumps
    (cli/package.scala:23-53: printEntries / printParsedLogEntries /
    printTransformedLogEntries). The reference prints EVERY entry; at
    Spark scale a full-corpus driver dump is an anti-feature, so each
    stage shows an n-row head under the reference's exact headers —
    .show() computes only the partitions it needs, the rest of the plan
    never runs."""
    parse_fn = parse_documents if parser == "pandas" else parse_documents_sql
    print(f"\n\nRead following log entries from {source}:")
    docs.drop("html").show(n, truncate=False)
    parsed = parse_fn(docs, cfg)
    print("\n\nExtracted the following statements out of the log entries:")
    parsed.show(n, truncate=False)
    print("\n\nTransformed the following log entries and their row identifiers:\n")
    uniquify_row_ids(parsed).show(n, truncate=False)


@dataclass
class PipelineResult:
    routed_counts: dict[str, int] = field(default_factory=dict)
    schema: SchemaSummary | None = None
    n_traces: int = 0
    n_traces_by_root: dict[str, int] = field(default_factory=dict)
    out_dir: str = ""


def build_traces_df(
    events: DataFrame, schema: SchemaSummary, root_table: str,
    include_update_values: bool = False, n_salt: int = 16,
) -> DataFrame:
    """Steps 6-7 as a reusable plan: (case_id, events, trace_xml)."""
    edges = entity_edges(events, schema)
    roots = root_cases(events, root_table, tables=schema.tables)
    assignments = propagate_cases(edges, roots, schema, root_table)
    assigned = with_xes_columns(
        assign_entries(events, assignments), include_update_values
    )
    traces = collect_traces(assigned, n_salt=n_salt)
    return trace_xml(traces)


def run_pipeline(
    docs: DataFrame,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    table_dict: DataFrame | None = None,
    lang_map: DataFrame | None = None,
    write_sinks: bool = True,
    parser: str = "pandas",
) -> PipelineResult:
    """Full run over a documents frame. Root class comes from cfg
    (replacing the reference's interactive prompt, cli/package.scala:73-86);
    when None, trace assembly is skipped (schema-only run).

    parser='pandas' (default, the byte-parity Arrow kernel) or 'sql'
    (pure-JVM expression parser — identical output on well-formed
    records, no Python workers; see functions/parse_sql.py)."""
    result = PipelineResult(out_dir=out_dir)

    parse_fn = parse_documents if parser == "pandas" else parse_documents_sql
    parsed = parse_fn(docs, cfg)
    events = uniquify_row_ids(parsed).cache()
    enriched = enrich(events, table_dict, lang_map)

    if write_sinks:
        result.routed_counts = write_fanout(enriched, out_dir)

    clean = enriched.filter(F.col("parse_error").isNull())
    cols_df, ind_df = discover_schema(
        clean,
        strict=cfg.strict_primary_keys,
        ind_mode="eager" if cfg.eager_ind else "final",
        mono_mode="reference" if cfg.reference_monotonicity else "log",
    )
    result.schema = summarize_schema(cols_df, ind_df)

    # Multi-root: the reference loops "pick a root → emit XES" over the
    # SAME parsed log and discovered schema until --singleRun
    # (Main.scala:131-162); here every requested root reuses the cached
    # events and the one discovery pass — one trace sink per root.
    roots = cfg.all_root_classes
    if roots:
        for rc in roots:
            # Java equalsIgnoreCase, not lowercase equality — matches
            # the trace layer's table matching (javaspace)
            if not any(
                java_equals_ignore_case(rc, t)
                for t in result.schema.tables
            ):
                raise ValueError(
                    f"root class {rc!r} not in discovered schema "
                    f"{sorted(result.schema.tables)}"
                )
        safe_names = _safe_root_names(roots)
        for rc in roots:
            traces = build_traces_df(
                clean, result.schema, rc,
                cfg.include_update_values, cfg.n_salt,
            )
            dest = (
                f"{out_dir}/traces_xes"
                if len(roots) == 1
                else f"{out_dir}/traces_xes/{safe_names[rc]}"
            )
            if write_sinks:
                traces.select("case_id", "trace_xml").write.mode(
                    "overwrite"
                ).parquet(dest)
                n = docs.sparkSession.read.parquet(dest).count()
            else:
                n = traces.count()
            if cfg.xes_document and write_sinks:
                # one complete reference-style .xes per root
                # (Main.scala:149-153 writes <path>_<root>_result.xes)
                from .functions.xes import trace_xml_pretty
                from .sinks.xes import (
                    reference_trace_order, write_xes_document)

                doc_path = (
                    f"{out_dir}/{safe_names[rc]}_result.xes"
                )
                order = (
                    reference_trace_order(clean, rc)
                    if cfg.reference_trace_order
                    else None
                )
                write_xes_document(
                    trace_xml_pretty(traces), doc_path, rc, pretty=True,
                    case_order=order,
                )
            result.n_traces_by_root[rc] = n
            result.n_traces += n

    events.unpersist()
    return result
