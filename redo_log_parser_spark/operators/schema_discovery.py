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

from ..caching import register

# far-future sentinel for open-ended validity intervals
_INF_TS = "9999-12-31 00:00:00"


def _sort_key(order_cols: tuple[str, ...]):
    return F.struct(*[F.col(c).alias(f"k{i}") for i, c in enumerate(order_cols)])


def insert_kv_pairs() -> F.Column:
    """array<struct<col,value,pos>> of an insert row's (column, value)
    pairs with duplicate column names collapsed LAST-wins: the reference
    folds the pairs through a mutable.HashMap (FileParser.scala:100-104),
    so only the final value ever reaches its schema state — an entry for
    an earlier value would plant a phantom value in PK-uniqueness / IND
    value sets and entity edges. Row-side O(k²) exists() over the
    (short) column list; first-occurrence position order is NOT kept
    (the survivor sits at its own position), which no consumer observes
    — engine-side orders come from explicit sorts, and the byte-order
    replicas live in oracle.py over insert_map."""
    return F.filter(
        F.transform(
            F.arrays_zip(F.col("insert_cols"), F.col("insert_vals")),
            lambda cv, i: F.struct(
                cv["insert_cols"].alias("col"),
                cv["insert_vals"].alias("value"),
                i.alias("pos"),
            ),
        ),
        lambda s: ~F.exists(
            F.slice(
                F.col("insert_cols"), s["pos"] + 2,
                F.size(F.col("insert_cols")),
            ),
            lambda c: c == s["col"],
        ),
    )


def column_writes(
    events: DataFrame, order_cols: tuple[str, ...] = ("ts", "url")
) -> DataFrame:
    """Long frame of per-column effects:
    (table_id, col, row_id, value, sk, kind) where kind ∈ write|delete.

    insert → one write per zipped (col, value) (SchemaExtractor.scala:65-88);
    update → one write of the NEW value (:93-116); delete → one tombstone
    per where-clause column except ROWID (:121-143).

    SINGLE PASS over events: the per-op effect lists are built with one
    CASE expression and one explode, not a union of three filtered
    branches. A branch union re-evaluates the whole upstream plan —
    including the pandas parse kernel — once per branch when nothing is
    cached (measured 3× parse cost at sf0.1, round-2 VERDICT item 4);
    one subtree means the parse runs once per action regardless of
    caching, and at 100 TB it is one scan instead of three."""
    sk = _sort_key(order_cols)
    write_lit = F.lit("write")
    ins_pairs = insert_kv_pairs()
    effects = (
        F.when(
            F.col("op") == "insert",
            F.transform(
                ins_pairs,
                lambda cv: F.struct(
                    cv["col"].alias("col"),
                    cv["value"].alias("value"),
                    write_lit.alias("kind"),
                ),
            ),
        )
        .when(
            F.col("op") == "update",
            F.array(
                F.struct(
                    F.col("upd_attr").alias("col"),
                    F.col("upd_new").alias("value"),
                    write_lit.alias("kind"),
                )
            ),
        )
        .when(
            F.col("op") == "delete",
            F.transform(
                F.filter(F.col("delete_cols"), lambda c: c != F.lit("ROWID")),
                lambda c: F.struct(
                    c.alias("col"),
                    F.lit(None).cast("string").alias("value"),
                    F.lit("delete").alias("kind"),
                ),
            ),
        )
        .otherwise(F.array().cast("array<struct<col:string,value:string,kind:string>>"))
    )
    return events.select(
        "table_id", "row_id", sk.alias("sk"), F.explode(effects).alias("e")
    ).select(
        "table_id",
        F.col("e.col").alias("col"),
        "row_id",
        F.col("e.value").alias("value"),
        "sk",
        F.col("e.kind").alias("kind"),
    )


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


def _sk_open_sentinel(writes: DataFrame):
    """Sentinel sort-key marking a still-open validity interval: a struct
    built from sk's ACTUAL schema (so any order_cols arity/typing works,
    not just the default ("ts","url")) whose FIRST field exceeds every
    real value — struct comparison then never consults later fields.
    Raises for field types with no max literal rather than comparing
    wrongly."""
    from pyspark.sql.types import (
        DateType, DoubleType, FloatType, IntegerType, LongType,
        StringType, StructType, TimestampType, TimestampNTZType,
    )

    sk_type = writes.schema["sk"].dataType
    if not isinstance(sk_type, StructType):
        raise TypeError(f"sk must be a struct sort key, got {sk_type}")
    lits = []
    for f in sk_type.fields:
        t = f.dataType
        if isinstance(t, (TimestampType, TimestampNTZType)):
            lit = F.lit(_INF_TS).cast(t.simpleString())
        elif isinstance(t, DateType):
            lit = F.lit("9999-12-31").cast("date")
        elif isinstance(t, StringType):
            # above every BMP/supplementary char in UTF8 binary order
            lit = F.lit("\U0010ffff")
        elif isinstance(t, (IntegerType, LongType)):
            lit = F.lit((1 << 31) - 1 if isinstance(t, IntegerType) else (1 << 63) - 1).cast(t.simpleString())
        elif isinstance(t, (FloatType, DoubleType)):
            lit = F.lit(float("inf")).cast(t.simpleString())
        else:
            raise TypeError(f"no max sentinel for sk field {f.name}: {t}")
        lits.append(lit.alias(f.name))
    return F.struct(*lits)


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
            F.coalesce(F.col("end_sk"), _sk_open_sentinel(writes)).alias("end_sk"),
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

    This implements the INTENDED semantics of
    Column.verifyIncreasingValuesOnChange (Column.scala:95-130): the
    branch gate maps (rowID, value) with BOTH `.toDouble`, so the
    numeric comparison runs only when every row id AND every value
    parses as a double (a real Oracle ROWID never does); anything else
    falls to the case-insensitive string comparison, here over
    log-ordered writes.

    ROUND-3 DISCOVERY (instrumented run of the actual reference binary,
    tests/fixtures/README.md): the SHIPPED check is vacuously true. Its
    `sliding(2).forall { case x :: y :: _ => x < y; case _ => true }`
    uses the List cons extractor, but `mutable.HashMap.values.toSeq`
    sliding windows are not Lists, so every window falls through to the
    default `true` — areValuesIncreasing never flips (the probe shows
    increasing=true even for STATE/NAME on redo_log.txt). Use
    discover_schema(mono_mode='reference') for byte-faithful strict
    output; this function remains the real signal."""
    wr = writes.filter(F.col("kind") == "write")
    w = Window.partitionBy("table_id", "col").orderBy("sk")
    stepped = wr.withColumn("prev", F.lag("value").over(w))
    num_prev = F.col("prev").try_cast("double")
    num_cur = F.col("value").try_cast("double")
    per_col = stepped.groupBy("table_id", "col").agg(
        F.min(
            F.col("value").try_cast("double").isNotNull()
            & F.col("row_id").try_cast("double").isNotNull()
        ).alias("all_numeric"),
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
    d = register(curr.select("table_id", "col", "value").distinct().cache())
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


def _value_intervals(writes: DataFrame) -> DataFrame:
    """(table_id, col, value, start_sk, end_sk) — validity intervals of
    written values: a write opens at its sk, the same row's next
    write/delete on the column closes (open intervals get the max
    sentinel). Same construction as pk_uniqueness, minus row identity."""
    w_row = Window.partitionBy("table_id", "col", "row_id").orderBy("sk")
    return (
        writes.withColumn("end_sk", F.lead("sk").over(w_row))
        .filter(F.col("kind") == "write")
        .select(
            "table_id",
            "col",
            "value",
            F.col("sk").alias("start_sk"),
            F.coalesce(F.col("end_sk"), _sk_open_sentinel(writes)).alias("end_sk"),
        )
    )


def inclusion_dependencies_eager(writes: DataFrame, registry: DataFrame) -> DataFrame:
    """A6 under the reference's EAGER/LATCHED semantics
    (SchemaDeriver.scala:69-93).

    The reference recomputes isSubsetOf after EVERY entry, but only ADDS
    a pair at an entry that CREATES one of the two TABLES — not merely
    one of the columns. previousSchema is `schema.clone()`
    (SchemaExtractor.scala:28), a SHALLOW HashMap clone whose Table
    values alias the live objects, so the two column-level
    `previousSchema(t).columns.contains(...)` clauses in the
    newColumns filter see the post-mutation column maps and are
    vacuously false for pre-existing tables; only the table-level
    `!previousSchema.contains(tableName)` clauses can fire. (Round-4
    discovery, pinned against the in-sandbox binary in
    tests/test_ind_semantics.py::test_eager_gate_is_table_birth_not_column_birth:
    a column born into an EXISTING table by a later statement never
    gains and is never gained as an FK target, even when inclusion
    holds from its creation onward.) REMOVALS (the similarColumns
    filter) still happen on every entry, and a removed pair can never
    re-add (its two tables are only ever created once). Net semantics:
    pair (A ⊆ B) is reported iff both columns already exist at
    t0 = max(table_birth(A's table), table_birth(B's table)) — i.e.
    each column appears in its table's very first statement or earlier
    than the other table's birth — and inclusion holds at every
    evaluation step from t0 through the end of the log.

    The final evaluation is the final state, so eager pairs ⊆ final
    pairs: candidates come from the final-state join and are FILTERED by
    a continuity check — no per-entry replay. Liveness of a value in a
    column is a union of write intervals, and every possible violation
    has a witness at an interval boundary (an A-interval start not
    covered by B, or a B-interval end inside a live A-interval — both
    are real log steps). Hence: holds-at-every-step ⇔ each A-interval
    clipped to [t0, ∞) chains through contiguous B-intervals of the
    same value. One extra window + one join + one fold over per-value
    interval arrays (small groups); pair frame is broadcast."""
    final_pairs = inclusion_dependencies(current_values(writes), registry)
    iv = _value_intervals(writes)
    created = writes.groupBy("table_id", "col").agg(F.min("sk").alias("created_sk"))
    tbirth = writes.groupBy("table_id").agg(F.min("sk").alias("tb_sk"))
    pairs = (
        final_pairs.join(created, ["table_id", "col"])
        .join(tbirth, ["table_id"])
        .join(
            created.select(
                F.col("table_id").alias("ref_table"),
                F.col("col").alias("ref_col"),
                F.col("created_sk").alias("ref_created_sk"),
            ),
            ["ref_table", "ref_col"],
        )
        .join(
            tbirth.select(
                F.col("table_id").alias("ref_table"),
                F.col("tb_sk").alias("ref_tb_sk"),
            ),
            ["ref_table"],
        )
        # pair birth = the entry creating the LATER of the two TABLES;
        # columns born after it never open the gate (see docstring)
        .withColumn("t0", F.greatest("tb_sk", "ref_tb_sk"))
        .filter(
            (F.col("created_sk") <= F.col("t0"))
            & (F.col("ref_created_sk") <= F.col("t0"))
        )
        .select("table_id", "col", "ref_table", "ref_col", "t0")
    )
    pkey = ["table_id", "col", "ref_table", "ref_col"]
    # The candidate-pair frame is SCHEMA-sized (≤ cols² rows, like the
    # driver summary) — materialize it once so the three joins below
    # don't each re-derive the whole final-state lineage.
    pair_rows = pairs.collect()
    spark = writes.sparkSession
    if not pair_rows:
        return spark.createDataFrame([], pairs.schema).select(*pkey)
    pairs = spark.createDataFrame(pair_rows, pairs.schema)
    a_iv = F.broadcast(pairs).join(iv, ["table_id", "col"]).select(
        *pkey, "t0", "value",
        F.col("start_sk").alias("a_start"), F.col("end_sk").alias("a_end"),
    )
    b_iv = F.broadcast(pairs.select(*pkey)).join(
        iv.select(
            F.col("table_id").alias("ref_table"),
            F.col("col").alias("ref_col"),
            "value", "start_sk", "end_sk",
        ),
        ["ref_table", "ref_col"],
    )
    b_grp = b_iv.groupBy(*pkey, "value").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("start_sk").alias("s"), F.col("end_sk").alias("e"))
            )
        ).alias("b_ivs")
    )
    joined = a_iv.join(b_grp, [*pkey, "value"], "left")
    lo = F.greatest(F.col("a_start"), F.col("t0"))
    # chain coverage: fold sorted B intervals, extending reach while the
    # next interval starts at or before it ([s,e) half-open ⇒ s<=reach
    # means contiguous); covered iff reach passes a_end
    reach = F.aggregate(
        F.col("b_ivs"),
        lo,
        lambda acc, x: F.when((x["s"] <= acc) & (x["e"] > acc), x["e"]).otherwise(acc),
    )
    viol = (lo < F.col("a_end")) & (
        F.col("b_ivs").isNull() | (reach < F.col("a_end"))
    )
    violated = (
        joined.withColumn("viol", viol)
        .groupBy(*pkey)
        .agg(F.max("viol").alias("any_viol"))
        .filter(F.col("any_viol"))
        .select(*pkey)
    )
    return pairs.select(*pkey).join(violated, pkey, "left_anti")


def discover_schema(
    events: DataFrame,
    order_cols: tuple[str, ...] = ("ts", "url"),
    strict: bool = False,
    ind_mode: str = "final",
    mono_mode: str = "log",
) -> tuple[DataFrame, DataFrame]:
    """Full schema discovery. Returns (columns_df, ind_df):

    columns_df: (table_id, col, can_be_pk, values_increasing,
                 name_like_pk, is_pk)
    ind_df:     (table_id, col, ref_table, ref_col) — INDs under
                ind_mode='final' (default: final-state inclusion) or
                'eager' (the reference's latched fold; both agree on the
                shipped artifacts, see tests/test_ind_semantics.py).
    mono_mode:  'log' (default) — values_increasing is the real
                log-order signal (the reference's documented intent);
                'reference' — constant True, byte-faithful to the
                shipped binary whose increasing check is vacuous (see
                monotonicity() docstring; pinned against a real strict
                console dump in tests/test_reference_golden.py).
    """
    if mono_mode not in ("log", "reference"):
        raise ValueError(f"mono_mode must be 'log' or 'reference', got {mono_mode!r}")
    writes = register(column_writes(events, order_cols).cache())
    registry = column_registry(writes)
    uniq = pk_uniqueness(writes)
    cols = registry.join(uniq, ["table_id", "col"], "left")
    if mono_mode == "log":
        cols = cols.join(monotonicity(writes), ["table_id", "col"], "left")
    else:
        cols = cols.withColumn("values_increasing", F.lit(True))
    cols = (
        cols
        # a column with no writes (delete-created) has no duplicates and
        # trivially increasing values — reference initializes both true
        .fillna({"can_be_pk": True, "values_increasing": True})
        .withColumn(
            # Java (?i) WITHOUT UNICODE_CASE = ASCII-only folding
            # (Column.scala:146-149 `matches("(?i:.*id)")` etc.) — a
            # KELVIN-SIGN "KEY" must NOT match (binary-probed; the old
            # F.lower() unicode-folded it to "key")
            "name_like_pk", F.col("col").rlike("(?i)(id|nr|key|no)\\z")
        )
    )
    pk_expr = (
        (F.col("can_be_pk") & F.col("values_increasing") & F.col("name_like_pk"))
        if strict
        else F.col("can_be_pk")
    )
    cols = cols.withColumn("is_pk", pk_expr)
    if ind_mode == "eager":
        ind = inclusion_dependencies_eager(writes, registry)
    elif ind_mode == "final":
        ind = inclusion_dependencies(current_values(writes), registry)
    else:
        raise ValueError(f"ind_mode must be 'final' or 'eager', got {ind_mode!r}")
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

    def format_console(self, strict: bool = False) -> str:
        """The reference's schema dump (Table.scala:38-42,
        Column.scala:43-61): per table a 'TABLE <name>' line, then one
        line per column — '<name> (PRIMARY KEY) ' or
        '(STRONG PRIMARY KEY)' under strict, plus
        'FK CANDIDATE FOR: <t>.<c> AND ...' from isSubsetOf. The
        reference iterates HashMaps (arbitrary order); this sorts tables
        and columns for determinism."""
        fk_by_col: dict[tuple[str, str], list[str]] = {}
        for i in sorted(
            self.inds,
            key=lambda i: (i["table_id"], i["col"], i["ref_table"], i["ref_col"]),
        ):
            fk_by_col.setdefault((i["table_id"], i["col"]), []).append(
                f"{i['ref_table']}.{i['ref_col']}"
            )
        blocks = []
        for t in self.tables:
            lines = [f"TABLE {t}"]
            cols = sorted(
                (c for c in self.columns if c["table_id"] == t),
                key=lambda c: c["col"],
            )
            for c in cols:
                pk = (
                    (" (STRONG PRIMARY KEY)" if strict else " (PRIMARY KEY)")
                    if c["is_pk"]
                    else ""
                )
                targets = fk_by_col.get((t, c["col"]), [])
                fk = "FK CANDIDATE FOR: " + " AND ".join(targets) if targets else ""
                lines.append(f"{c['col']}{pk} {fk}")
            blocks.append("\n".join(lines))
        return "\n\n".join(blocks)

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
