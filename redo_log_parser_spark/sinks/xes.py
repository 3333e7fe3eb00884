"""XES sink (S3 — TraceIDParser.serializeLogToDisk, :153-160).

Two modes:
  * write_traces: per-trace XML strings to a parquet/text sink —
    the scale path (10^9 traces never become one XML document).
  * write_xes_document: assemble ONE complete .xes file (header +
    traces + footer) like the reference CLI does — for tooling
    compatibility on small outputs. Trace order defaults to a
    deterministic case_id sort; pass case_order=reference_trace_order(
    events, root) for the reference binary's exact document order
    (whole-file byte equality). Content per trace has log order.

The reference pretty-prints with scala.xml.PrettyPrinter(200, 2) and
re-saves with XML.save (TraceIDParser.scala:153-160). pretty=True
replicates that layout (2-space steps, events one-per-line under 200
cols, XML.save's single-quoted xml declaration) so small outputs diff
clean against a reference-produced .xes; the layout is pinned byte-wise
by a golden test. (The reference repo ships no .xes artifact, so the
pin is against the modeled PrettyPrinter semantics, documented in
functions/xes.py.) Default mode stays canonical single-line elements
(whitespace-insensitive XML equality, asserted canonically in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.javaspace import java_equals_ignore_case
from ..functions.xes import xes_log_header, xes_pretty_header


def write_traces(traces_xml: DataFrame, out_dir: str, fmt: str = "parquet") -> None:
    (traces_xml.select("case_id", "trace_xml").write.mode("overwrite").format(fmt).save(out_dir))


def write_xes_document(
    traces_xml: DataFrame, path: str, root_table: str, pretty: bool = False,
    case_order: list[str] | None = None,
) -> int:
    """Write one complete XES 2.0 XML document. Returns trace count.

    pretty=False: canonical single-line elements. pretty=True: the
    reference's PrettyPrinter(200,2) layout — pass a frame produced by
    functions.xes.trace_xml_pretty (its trace_xml blocks carry the
    indentation).

    case_order (optional): explicit document-level trace order as a
    list of case ids — pass reference_trace_order(...) to reproduce the
    reference binary's Scala-HashMap trace order byte-for-byte (the
    default is a deterministic case_id sort). Driver-side reorder —
    pair it only with reference-CLI-sized outputs.

    Deliberately a driver-side assembly (toLocalIterator — streams
    partitions, never materializes all traces at once); intended for
    reference-CLI-sized outputs, not the 10^12-row path."""
    n = 0
    with open(path, "w", encoding="utf-8", newline="") as fh:
        if pretty:
            fh.write(xes_pretty_header(root_table) + "\n")
        else:
            fh.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            fh.write(xes_log_header(root_table))
        if case_order is not None:
            collected = traces_xml.select("case_id", "trace_xml").collect()
            by_case = {r["case_id"]: r["trace_xml"] for r in collected}
            # both directions are replica-divergence signals, not
            # conditions to paper over: a duplicate case_id would
            # silently collapse into one dict entry (undercounting n),
            # and a stale/extra id in the replayed order would silently
            # skip — raise instead so a build_traces_df or trace-order
            # regression is flagged at the sink
            if len(by_case) != len(collected):
                from collections import Counter
                dups = [c for c, k in Counter(
                    r["case_id"] for r in collected).items() if k > 1]
                raise ValueError(
                    f"traces_xml carries duplicate case ids, e.g. "
                    f"{sorted(dups)[:3]} — one trace per case expected"
                )
            missing = set(by_case) - set(case_order)
            extra = set(case_order) - set(by_case)
            if missing or extra:
                raise ValueError(
                    f"case_order disagrees with the data: "
                    f"{len(missing)} case ids absent from the order "
                    f"(e.g. {sorted(missing)[:3]}), {len(extra)} order "
                    f"entries absent from the data (e.g. {sorted(extra)[:3]})"
                )
            rows = ({"trace_xml": by_case[c]} for c in case_order)
        else:
            rows = (
                traces_xml.select("case_id", "trace_xml")
                .orderBy("case_id")
                .toLocalIterator()
            )
        for row in rows:
            fh.write(row["trace_xml"])
            if pretty:
                fh.write("\n")
            n += 1
        fh.write("</log>")
    return n


def reference_trace_order(
    events: DataFrame, root_table: str, seed: int = 42,
    max_rows: int = 1_000_000,
) -> list[str]:
    """The reference binary's document-level trace order, as this
    engine's case ids (round-3 VERDICT #5 — closes the one remaining
    .xes divergence, the trace-block multiset canonicalization).

    The reference emits traces in `logEntries.groupBy(_.rowID)`
    iteration order over the root table's entries
    (TraceIDParser.scala:46-57, TraceIDParserHelper.scala:19-25) —
    Scala 2.12 immutable-HashMap order over its (randomly suffixed)
    row-id strings. Both layers are replicated in pure Python
    (functions/scala_order.py, each pinned against the in-sandbox
    Scala 2.12.19 toolchain): the seeded suffix stream rebuilds the
    reference's row-id strings from this engine's deterministic
    `orig#k` ids, and the HAMT replica orders them. Driver-side over
    the collected event log — reference-CLI-sized inputs only."""
    from ..functions.scala_order import (
        reference_row_id_map, scala212_groupby_order)

    rows = events
    if "parse_error" in rows.columns:
        rows = rows.filter(F.col("parse_error").isNull())
    rows = rows.select("ts", "url", "orig_row_id", "row_id", "op", "table_id")
    # ONE job: limit(max_rows + 1) both enforces the guard and collects
    # (a separate count() would recompute the whole events lineage —
    # exactly on the large uncached inputs the guard exists for)
    collected = rows.orderBy("ts", "url").limit(max_rows + 1).collect()
    if len(collected) > max_rows:
        raise ValueError(
            f"reference_trace_order collects the event log to the driver "
            f"(> max_rows={max_rows} rows); it exists only to "
            "replicate the reference CLI's HashMap trace order on "
            "reference-CLI-sized logs. Use the default sorted case_id "
            "order for large inputs, or raise max_rows explicitly."
        )
    ref_map = reference_row_id_map(
        [(r["orig_row_id"], r["op"]) for r in collected], seed
    )
    seen: dict[str, str] = {}
    seen_orig: dict[str, str] = {}
    # The reference's bucket order is a NESTED groupBy (TraceIDParser
    # .scala:46-57): outer `logEntries.groupBy(_.tableID)` over ALL
    # tables — iterated in Scala-Map order, filtered equalsIgnoreCase
    # to the root (Helper:23) — then per table `groupBy(_.rowID)`.
    # With case-colliding table names (fuzz axis `caseclash`) BOTH
    # siblings contribute, each under its own per-table row order, in
    # the table-map's iteration order over the FULL table-id key set.
    tables_first: list[str] = []
    rows_in_table: dict[str, list[str]] = {}
    tset: set[str] = set()
    for r in collected:
        t = r["table_id"]
        if t not in tset:
            tset.add(t)
            tables_first.append(t)
        if not java_equals_ignore_case(t, root_table):
            continue
        cid = r["row_id"]
        if cid not in seen:
            rows_in_table.setdefault(t, []).append(cid)
            orig = r["orig_row_id"]
            # incarnation index by PREFIX slice against the known orig id
            # (cid == concat(orig, '#', k) by construction) — rsplit would
            # mis-parse an orig that itself contains '#' (ADVICE r4)
            if cid == orig:
                k = 0
            elif cid.startswith(orig + "#"):
                k = int(cid[len(orig) + 1:])
            else:
                raise ValueError(
                    f"row_id {cid!r} is not orig_row_id {orig!r} plus an "
                    "incarnation suffix - was uniquify_row_ids applied?"
                )
            seen[cid] = ref_map[(orig, k)]
            seen_orig[cid] = orig
        elif seen_orig[cid] != r["orig_row_id"]:
            # two distinct source ids collided in incarnation space, e.g.
            # orig 'A' incarnation 1 vs a literal source id 'A#1'
            raise ValueError(
                f"incarnation-id collision: {cid!r} arises from both "
                f"{seen_orig[cid]!r} and {r['orig_row_id']!r}; source row "
                "ids containing '#' are ambiguous under the deterministic "
                "suffix scheme (SURVEY.md §1.3.3)"
            )
    out: list[str] = []
    for t in scala212_groupby_order(tables_first):
        if not java_equals_ignore_case(t, root_table):
            continue
        ref_ids = [seen[cid] for cid in rows_in_table.get(t, [])]
        ours_of = {seen[cid]: cid for cid in rows_in_table.get(t, [])}
        out.extend(
            ours_of[rid] for rid in scala212_groupby_order(ref_ids)
        )
    return out
