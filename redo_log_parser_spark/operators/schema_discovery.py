"""A1-A8 — schema discovery as distributed aggregations (SURVEY.md §2.4).

The reference folds every log entry into mutable HashMaps and re-checks
PK/IND properties after each entry (SchemaExtractor.scala:27-45,
SchemaDeriver.scala:31-95) — O(entries × tables² × cols² × values).
Here each property is one declarative aggregate over the parsed-events
frame; Catalyst plans partial+final aggregation, and the whole discovery
costs a handful of shuffles regardless of input size.

Semantics preserved (SURVEY.md §1.3 item 4):
  * Column registry: every column ever referenced, including columns
    created empty by delete statements (SchemaExtractor.scala:130-137).
  * Current values: last write per (table, column, row) wins; a delete
    removes the value only for columns NAMED in its where clause
    (SchemaExtractor.scala:126-141); ROWID key excluded (:58,127).
  * canBePrimaryKey is sticky-false (Column.scala:79-84 runs after every
    affecting entry): a transient duplicate at ANY prefix disqualifies.
    Exact equivalent without replaying prefixes: two rows held the same
    value with overlapping validity intervals. Computed with one window.
  * areValuesIncreasing over log-ordered writes (the reference iterates
    a HashMap — order-unstable; log order is the documented intent).
  * IND/FK: final-state inclusion across tables (matches the eager
    latched fold on both shipped artifacts). Computed as ONE join over
    deduped column values, not N² anti-joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# far-future sentinel for open-ended validity intervals
_INF_TS = "9999-12-31 00:00:00"


def _sort_key(order_cols: tuple[str, ...]):
    return F.struct(*[F.col(c).alias(f"k{i}") for i, c in enumerate(order_cols)])


def column_writes(
    events: DataFrame, order_cols: tuple[str, ...] = ("ts", "url")
) -> DataFrame:
    """Long frame of per-column effects:
    (table_id, col, row_id, value, sk, kind) where kind ∈ write|delete.

    insert → one write per zipped (col, value) (SchemaExtractor.scala:65-88);
    update → one write of the NEW value (:93-116); delete → one tombstone
    per where-clause column except ROWID (:121-143)."""
    sk = _sort_key(order_cols)
    ins = (
        events.filter(F.col("op") == "insert")
        .select(
            "table_id",
            "row_id",
            sk.alias("sk"),
            F.explode(F.arrays_zip(F.col("insert_cols"), F.col("insert_vals"))).alias("cv"),
        )
        .select(
            "table_id",
            F.col("cv.insert_cols").alias("col"),
            "row_id",
            F.col("cv.insert_vals").alias("value"),
            "sk",
            F.lit("write").alias("kind"),
        )
    )
    upd = events.filter(F.col("op") == "update").select(
        "table_id",
        F.col("upd_attr").alias("col"),
        "row_id",
        F.col("upd_new").alias("value"),
        sk.alias("sk"),
        F.lit("write").alias("kind"),
    )
    dele = (
        events.filter(F.col("op") == "delete")
        .select(
            "table_id", "row_id", sk.alias("sk"), F.explode("delete_cols").alias("col")
        )
        .filter(F.col("col") != "ROWID")
        .select(
            "table_id",
            "col",
            "row_id",
            F.lit(None).cast("string").alias("value"),
            "sk",
            F.lit("delete").alias("kind"),
        )
    )
    return ins.unionByName(upd).unionByName(dele)


def column_registry(writes: DataFrame) -> DataFrame:
    """A1 + column existence: every (table, column) ever referenced."""
    return writes.select("table_id", "col").distinct()


def current_values(writes: DataFrame) -> DataFrame:
    """A2 — latest value per (table, col, row); deleted values drop out.
    One window (hash-partitioned on the group key), no driver state."""
    w = Window.partitionBy("table_id", "col", "row_id").orderBy(F.desc("sk"))
    return (
        writes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("kind") == "write"))
        .select("table_id", "col", "row_id", "value")
    )


def pk_uniqueness(writes: DataFrame) -> DataFrame:
    """A3 — sticky canBePrimaryKey via value-lifetime overlap.

    Each write opens a validity interval for (table,col,row,value) that
    closes at that row's next write/delete on the column (lead window).
    A duplicate existed at some prefix ⇔ two intervals of the same
    (table,col,value) from different rows overlap ⇔ ordering intervals
    by start, some interval starts before the running max end of its
    predecessors. Two windows, zero self-joins."""
    w_row = Window.partitionBy("table_id", "col", "row_id").orderBy("sk")
    iv = (
        writes.withColumn("end_sk", F.lead("sk").over(w_row))
        .filter(F.col("kind") == "write")
        .select(
            "table_id",
            "col",
            "row_id",
            "value",
            F.col("sk").alias("start_sk"),
            F.coalesce(
                F.col("end_sk"),
                F.struct(
                    F.lit(_INF_TS).cast("timestamp").alias("k0"),
                    F.lit("~").alias("k1"),
                ),
            ).alias("end_sk"),
        )
    )
    w_val = (
        Window.partitionBy("table_id", "col", "value")
        .orderBy("start_sk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    overlapped = iv.withColumn("prev_max_end", F.max("end_sk").over(w_val)).withColumn(
        "overlap",
        F.col("prev_max_end").isNotNull() & (F.col("start_sk") < F.col("prev_max_end")),
    )
    return overlapped.groupBy("table_id", "col").agg(
        (~F.max("overlap")).alias("can_be_pk")
    )


def monotonicity(writes: DataFrame) -> DataFrame:
    """A4 — were log-ordered written values strictly increasing?
    Numeric comparison when every value casts to double, else
    case-insensitive string comparison (Column.scala:95-130)."""
    wr = writes.filter(F.col("kind") == "write")
    w = Window.partitionBy("table_id", "col").orderBy("sk")
    stepped = wr.withColumn("prev", F.lag("value").over(w))
    num_prev = F.col("prev").try_cast("double")
    num_cur = F.col("value").try_cast("double")
    per_col = stepped.groupBy("table_id", "col").agg(
        F.min(F.col("value").try_cast("double").isNotNull()).alias("all_numeric"),
        F.min(
            F.when(F.col("prev").isNull(), F.lit(True)).otherwise(num_prev < num_cur)
        ).alias("inc_numeric"),
        F.min(
            F.when(F.col("prev").isNull(), F.lit(True)).otherwise(
                F.lower("prev") < F.lower("value")
            )
        ).alias("inc_string"),
    )
    return per_col.select(
        "table_id",
        "col",
        F.when(F.col("all_numeric"), F.col("inc_numeric"))
        .otherwise(F.col("inc_string"))
        .alias("values_increasing"),
    )


def inclusion_dependencies(curr: DataFrame, registry: DataFrame) -> DataFrame:
    """A6 — all cross-table inclusion dependencies in ONE shuffle join.

    distinct(A) ⊆ distinct(B)  ⇔  |distinct(A) ∩ distinct(B)| = |distinct(A)|.
    Deduped values joined on value; per column-pair match counts compared
    to the left column's distinct count. Empty columns (possible via
    delete-created columns) are ⊆ every other-table column
    (forall over empty set, SchemaDeriver.scala:63)."""
    d = curr.select("table_id", "col", "value").distinct().cache()
    n = d.groupBy("table_id", "col").agg(F.count("*").alias("n_distinct"))
    a = d.alias("a")
    b = d.alias("b")
    matched = (
        a.join(b, F.col("a.value") == F.col("b.value"))
        .filter(F.col("a.table_id") != F.col("b.table_id"))
        .groupBy(
            F.col("a.table_id").alias("table_id"),
            F.col("a.col").alias("col"),
            F.col("b.table_id").alias("ref_table"),
            F.col("b.col").alias("ref_col"),
        )
        .agg(F.count("*").alias("n_match"))
    )
    ind = (
        matched.join(n, ["table_id", "col"])
        .filter(F.col("n_match") == F.col("n_distinct"))
        .select("table_id", "col", "ref_table", "ref_col")
    )
    # empty columns: in the registry but absent from current values
    nonempty = d.select("table_id", "col").distinct()
    empty = registry.join(nonempty, ["table_id", "col"], "left_anti")
    empty_pairs = (
        empty.crossJoin(
            registry.select(
                F.col("table_id").alias("ref_table"), F.col("col").alias("ref_col")
            )
        )
        .filter(F.col("table_id") != F.col("ref_table"))
        .select("table_id", "col", "ref_table", "ref_col")
    )
    return ind.unionByName(empty_pairs)


def discover_schema(
    events: DataFrame,
    order_cols: tuple[str, ...] = ("ts", "url"),
    strict: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Full schema discovery. Returns (columns_df, ind_df):

    columns_df: (table_id, col, can_be_pk, values_increasing,
                 name_like_pk, is_pk)
    ind_df:     (table_id, col, ref_table, ref_col) — final-state INDs.
    """
    writes = column_writes(events, order_cols).cache()
    registry = column_registry(writes)
    uniq = pk_uniqueness(writes)
    mono = monotonicity(writes)
    cols = (
        registry.join(uniq, ["table_id", "col"], "left")
        .join(mono, ["table_id", "col"], "left")
        # a column with no writes (delete-created) has no duplicates and
        # trivially increasing values — reference initializes both true
        .fillna({"can_be_pk": True, "values_increasing": True})
        .withColumn(
            "name_like_pk", F.lower("col").rlike("(id|nr|key|no)$")
        )
    )
    pk_expr = (
        (F.col("can_be_pk") & F.col("values_increasing") & F.col("name_like_pk"))
        if strict
        else F.col("can_be_pk")
    )
    cols = cols.withColumn("is_pk", pk_expr)
    ind = inclusion_dependencies(current_values(writes), registry)
    return cols, ind


@dataclass(frozen=True)
class SchemaSummary:
    """Driver-side snapshot (tables/columns are few even when rows are
    not) used for trace-graph planning and CLI display."""

    columns: list[dict]
    inds: list[dict]

    @property
    def tables(self) -> list[str]:
        return sorted({c["table_id"] for c in self.columns})

    def pk_candidates(self) -> set[tuple[str, str]]:
        return {(c["table_id"], c["col"]) for c in self.columns if c["is_pk"]}

    def fk_pairs(self) -> list[tuple[str, str, str, str]]:
        """ColumnRelations: (fk_table, fk_col, pk_table, pk_col) where the
        REFERENCED column is a PK candidate (RelationsExtractor.scala:207,227)."""
        pks = self.pk_candidates()
        return sorted(
            (i["table_id"], i["col"], i["ref_table"], i["ref_col"])
            for i in self.inds
            if (i["ref_table"], i["ref_col"]) in pks
        )


def summarize_schema(cols: DataFrame, ind: DataFrame) -> SchemaSummary:
    return SchemaSummary(
        columns=[r.asDict() for r in cols.collect()],
        inds=[r.asDict() for r in ind.collect()],
    )
