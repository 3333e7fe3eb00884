"""Seeded random redo-log generator for differential fuzzing.

Generates format-valid logs in the reference's 2-line chunk layout
(statement line + `ROWID  dd-MMM-yyyy HH:mm:ss` line, whitespace-only
separators, trailing-space noise) with randomized schema shape and
lifecycle structure:

- 2-4 tables, 1-4 columns each (ID + name/state/amount/FK-shaped extras)
- per-row lifecycles: insert -> updates (old-value chains) -> optional
  delete -> optional ROWID-reuse re-insert (incarnation restarts,
  EventExtractor.scala:44-87) or a rare update-after-delete
  (statement-after-delete restart)
- value regimes chosen per column: unique sequential ints, fixed-width
  (string-increasing) ids, collision-prone small ints, names, state
  machines, parent-id references (so IND/FK discovery sees real
  inclusion structure that deletes can break)
- global interleave via random merge preserving per-row statement order
- timestamps that advance 0-2 s per statement (equal-ts ties common)

No ground truth is planned: the REFERENCE BINARY is the oracle
(tests/refbin.py). The generator only guarantees the input is in-format.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from redo_log_parser_spark.fixtures import Stmt, _fmt_ts, _rowid

_TABLE_POOL = ["USERS", "ORDERS", "INVOICES", "ITEMS", "SHIPMENTS",
               # extension pool for the wide-schema axis (round 5); the
               # first five stay in place so pre-round-5 seeds reproduce
               "CUSTOMERS", "PAYMENTS", "TICKETS", "VENDORS", "RETURNS",
               "ACCOUNTS", "REGIONS"]
# The second half is the ADVERSARIAL alphabet: values the reference's
# greedy full-match regexes + substring stripping survive (calibrated
# against the real binary) but that exercise the nasty backtracking
# paths — embedded '=', ';', parens, 'where', 'AND', double spaces,
# leading/trailing spaces, an apostrophe, the empty string. Excluded
# because they CRASH the reference (so no parity target exists):
# ',' (insert split arity check), ' and ' (delete split MatchError),
# ' = ' (update attribute1 != attribute2 check).
_NAME_POOL = [
    "Liam", "Emma", "Noah", "Olivia", "Ava", "Mason", "Harper", "Logan",
    "", "a=b", "x;y", "q(r", "s)t", "u where u", "andy AND b",
    "two  spaces", "trail ", " lead", "u_s-d.d:c", "it's",
]
_STATE_POOL = ["created", "checking", "confirmed", "paid", "sent", "void"]

# Unicode-axis value pool (round 5). Everything here SURVIVES the
# reference under a UTF-8 locale (probed): BMP multibyte, astral
# (surrogate-pair) chars, NBSP (NOT Java whitespace — never trimmed,
# never TextBuffer-collapsed), space runs adjacent to multibyte chars.
# The long entries land the updvals event name around the
# PrettyPrinter 200-col cutover, where UTF-16-unit vs code-point
# accounting diverges (functions/xes.py). Excluded crash shapes, like
# ','  for ASCII: \x85     inside values (Java regex . refuses
# them -> reference insertPattern MatchError).
_UNI_POOL = [
    "café", "中文值", "Ωmega", "naïve Ärger", "ß-groß",
    "😀😀", "x😀y", "🐍snake", "ab😀 中",
    "x y", " nb-lead", "nb-trail ",
    "two  spaces😀", "中  文",
] + [
    # threshold-straddlers: 6 astral chars each (u16 = cp + 6); cp
    # lengths chosen so escaped event names sweep the 162/163 window
    # across the varying table/attr-name bases
    "😀" * 6 + "a" * n for n in (64, 72, 80, 88, 96, 104, 140)
]

# uniname axis (round 5): unicode TABLE/COLUMN names. These flow where
# values never go — the Scala-HashMap iteration replicas (console table
# + column order, FK-target tails, trace groupBy order) hash them as
# UTF-16 code units (surrogate pair = 2 units, scala_order.py), the
# statement regexes match them under Java `.`, and XES event names
# carry them through the PrettyPrinter threshold. Probed: the reference
# survives unicode names (incl. as the root-class argv) under the UTF-8
# locale. Pools exclude the structural chars the reference's splits
# can't survive in NAMES: ',' (insert column-list split), '"', '(',
# ')', ' = ', ' and ', and all line terminators.
_UNI_TABLE_POOL = ["ÜBERWEISUNGEN", "ЗАКАЗЫ", "订单表", "FAKTURY😀",
                   "ÉTATS", "NÁKUPY", "ΠΙΝΑΚΑΣ", "ÅRSAK"]
_UNI_COL_POOL = ["NÄME", "СТАТУС", "金额", "PŘÍZNAK", "C😀L", "ΤΙΜΗ",
                 "SOMMAIRE", "DÅTO"]
# regex-metacharacter / space / '=' bearing ASCII names: the reference
# patterns are STATIC (no name is ever embedded into a regex), so these
# must flow through both sides as opaque data — any path that builds a
# pattern from a name, splits an id on '.', or treats '$'/'('/'[' as
# syntax diverges. Excluded (reference-crash shapes, same class as the
# value alphabet): ',' (insert col split), ' and ' (delete pair split),
# ' = ' (update/attr ambiguity), '"' and ';'.
_META_TABLE_POOL = ["OR.DERS", "T(1)", "A+B*C", "X$Y", "M[0]", "N{2}",
                    "P^Q|R", "E#F", "USE RS", "D&G!"]
_META_COL_POOL = ["N.A+ME", "C(2)", "V*L$", "S=T", "A[1]", "B{9}",
                  "W^Z|Q", "H#K", "P Q", "R&J~"]
# pairs that Java String.equalsIgnoreCase treats as EQUAL but Python
# str.lower() does not ('İ'→'i̇' two chars in Python, 'i' in Java's
# simple mapping; 'ı'~'I'; 'Σ'~'ς' via shared uppercase) — probed
# in-sandbox, javaspace.java_equals_ignore_case
_UNICASE_PAIRS = [("İŞLEM", "işlem"), ("ILIK", "ılık"),
                  ("ΠΟΣ", "πος"), ("İX2", "ix2")]


class _ColSpec:
    """Value generator for one column."""

    def __init__(self, kind: str, rng: random.Random, parent_ids=None):
        self.kind = kind
        self.base = rng.randrange(0, 5000)
        self.width = rng.choice([3, 4])
        self.small = rng.randrange(2, 9)
        # Keep the SHARED list reference: id_values[parent] is empty at
        # construction and is appended to as parent rows spawn — `or []`
        # would freeze an empty private copy and every fk draw would hit
        # the "0" fallback (round-4 review finding: 1365/1365 fk values
        # were "0", silently defeating the FK-shaped fuzz coverage).
        self.parent_ids = parent_ids if parent_ids is not None else []
        self.counter = 0

    def fresh(self, rng: random.Random) -> str:
        self.counter += 1
        i = self.counter
        if self.kind == "seq":
            return str(self.base + i)
        if self.kind == "seqpad":
            return f"{self.base + i:0{self.width}d}"
        if self.kind == "dup":
            return str(rng.randrange(self.small))
        if self.kind == "name":
            return rng.choice(_NAME_POOL)
        if self.kind == "uname":
            return rng.choice(_UNI_POOL)
        if self.kind == "state":
            return _STATE_POOL[0]
        if self.kind == "fk":
            return rng.choice(self.parent_ids) if self.parent_ids else "0"
        raise AssertionError(self.kind)

    def next_update(self, rng: random.Random, cur: str) -> str:
        if self.kind == "state":
            nxt = _STATE_POOL[
                min(_STATE_POOL.index(cur) + 1, len(_STATE_POOL) - 1)
            ]
            return nxt
        return self.fresh(rng)


def _ins(table_id: str, row_id: str, cols: list[str], vals: list[str]) -> Stmt:
    """table_id is the FULL quoted '"SCHEMA"."NAME"' id (multischema
    axis); default callers pass '"SYSTEM"."<name>"' so pre-round-5
    seeds stay byte-identical."""
    col_s = ",".join(f'"{c}"' for c in cols)
    val_s = ",".join(f"'{v}'" for v in vals)
    return Stmt(
        f'insert into {table_id}({col_s}) values ({val_s});', row_id
    )


def _upd(table_id: str, row_id: str, attr: str, new: str, old: str) -> Stmt:
    return Stmt(
        f'update {table_id} set "{attr}" = \'{new}\' where "{attr}" ='
        f" '{old}' and ROWID = '{row_id}';",
        row_id,
    )


def _del(table_id: str, row_id: str, state: dict[str, str],
         full_where: bool, rng: random.Random) -> Stmt:
    if full_where:
        where = " and ".join(f'"{c}" = \'{v}\'' for c, v in state.items())
    else:
        c, v = rng.choice(list(state.items()))
        where = f'"{c}" = \'{v}\''
    return Stmt(
        f'delete from {table_id} where {where} and ROWID ='
        f" '{row_id}';",
        row_id,
    )


def fuzz_statements(
    seed: int,
    *,
    n_tables_range: tuple[int, int] = (2, 4),
    dup_col_prob: float = 0.0,
    uni_prob: float = 0.0,
    uni_name_prob: float = 0.0,
    rid_style: str = "oracle",
    multischema_prob: float = 0.0,
    meta_name_prob: float = 0.0,
    ridcol_prob: float = 0.0,
    caseclash_prob: float = 0.0,
    unicase_prob: float = 0.0,
) -> tuple[list[Stmt], list[str]]:
    """Return (statements, table_ids). Deterministic per seed.

    Round-5 axes (opt-in; every new random draw comes from a SEPARATE
    stream so default-parameter output is byte-identical to pre-round-5
    seeds):
      * n_tables_range: widen to e.g. (9, 10) for the wide-schema axis.
        The reference binary's per-entry console walk is O(tables!), so
        wide logs are validated engine-vs-`oracle.eager_inds_replay`
        instead of vs the binary (see jobs/diff_fuzz_sweep.py --axis).
      * dup_col_prob: probability per insert of listing one column name
        TWICE with two different values — the reference's insert
        extraction folds them through a mutable.HashMap (FileParser
        .scala:100-110), silently keeping the LAST value; the engine
        must agree end-to-end.
      * uni_prob: probability a name-kind column draws from _UNI_POOL
        (BMP multibyte / astral / NBSP / PrettyPrinter-threshold
        straddlers) instead of _NAME_POOL. Pair with render_log
        ws_style='unicode' and run the binary with utf8=True.
      * uni_name_prob: probability a TABLE is renamed from
        _UNI_TABLE_POOL and each extra COLUMN from _UNI_COL_POOL —
        unicode identifiers reach the HashMap-order replicas and the
        statement regexes (a renamed parent also yields a unicode
        FK column name '<parent>_ID'). Separate rng stream so every
        other axis's seeds reproduce byte-identically.
      * rid_style: 'oracle' (default, 18-char Oracle-ish) | 'hash'
        (source ROWIDs CONTAINING '#' — leading, inside, doubled, and
        a trailing '#2' that LOOKS like an engine incarnation suffix:
        the deterministic-suffix machinery (uniquify, the sink's
        prefix-slice incarnation recovery, the reference random-suffix
        replay keyed (orig, k)) must never confuse a literal '#' in a
        source id with its own suffix — round-4 ADVICE shape) |
        'numeric' (all-digit ROWIDs, parse as doubles — the shape real
        Oracle never emits but nothing in the reference rejects;
        exercises the RowID HashMap replay + trace groupBy hashing on
        numeric-string keys). Deterministic transforms of the default
        ids — no extra rng draws, so other axes reproduce.
      * multischema_prob: probability a table lives under a schema
        other than "SYSTEM" — and, when it fires at all with >=2
        tables, the LAST table is additionally renamed to share the
        FIRST table's BARE name under a different schema (two distinct
        tables '"SYSTEM"."USERS"' / '"APP"."USERS"' with different
        column sets): any code path keying on the bare table name
        instead of the full quoted id diverges immediately. Separate
        rng stream (seed*409+29).
      * meta_name_prob: probability a TABLE is renamed from
        _META_TABLE_POOL and each extra COLUMN from _META_COL_POOL —
        regex-metachar / dot / space / '=' names as opaque data (see
        the pool comment). Separate rng stream (seed*613+7).
      * caseclash_prob: probability (when >=2 tables) the LAST table is
        renamed to the lowercase of the FIRST table's name — two
        DISTINCT schema entries ('"SYSTEM"."USERS"' / '"SYSTEM"."users"',
        independent column sets: the reference schema HashMap is
        case-sensitive) that the reference's trace/relations layers
        compare with equalsIgnoreCase (TraceIDParserHelper.scala:23
        root-bucket gathering, RelationsExtractor.scala:205,225
        reference matching) while bucket ASSIGNMENT is exact
        (TraceIDParserHelper.scala:51). Separate rng stream
        (seed*1013+17).
      * unicase_prob: probability (when >=2 tables) the FIRST and LAST
        tables are renamed to a _UNICASE_PAIRS pair — table ids that
        are Java-equalsIgnoreCase-EQUAL but Python-lower-UNEQUAL
        ('İŞLEM'/'işlem'): the reference's case-insensitive trace
        layers must be replicated with Java semantics, not .lower().
        Separate rng stream (seed*1213+3).
      * ridcol_prob: probability (per table, at most one column) an
        extra column is literally named ROWID. The reference filters
        the where-clause ROWID pair BY NAME and ONLY in delete
        extraction (SchemaExtractor.scala:58,127) — an inserted or
        updated column named ROWID is a real schema column, while in a
        delete it vanishes (and its where-pair value collides with the
        actual row id in the mutable.HashMap). Separate rng stream
        (seed*809+11)."""
    rng = random.Random(seed)
    rng_axis = random.Random(seed * 101 + 13)  # new-axis stream only
    rng_names = random.Random(seed * 211 + 5)  # uniname stream only
    rng_schema = random.Random(seed * 409 + 29)  # multischema stream only
    rng_meta = random.Random(seed * 613 + 7)  # metaname stream only
    rng_ridcol = random.Random(seed * 809 + 11)  # ridcol stream only
    rng_case = random.Random(seed * 1013 + 17)  # caseclash stream only
    n_tables = rng.randint(*n_tables_range)
    tables = _TABLE_POOL[:n_tables]
    if uni_name_prob:
        uni_tbl = list(_UNI_TABLE_POOL)
        rng_names.shuffle(uni_tbl)
        tables = [
            uni_tbl.pop() if rng_names.random() < uni_name_prob else t
            for t in tables
        ]
    if meta_name_prob:
        meta_tbl = list(_META_TABLE_POOL)
        rng_meta.shuffle(meta_tbl)
        tables = [
            meta_tbl.pop() if rng_meta.random() < meta_name_prob else t
            for t in tables
        ]
    if (caseclash_prob and len(tables) >= 2
            and rng_case.random() < caseclash_prob):
        variant = tables[0].lower()
        if variant != tables[0] and variant not in tables:
            tables[-1] = variant
    rng_unicase = random.Random(seed * 1213 + 3)  # unicase stream only
    if (unicase_prob and len(tables) >= 2
            and rng_unicase.random() < unicase_prob):
        a, b = _UNICASE_PAIRS[rng_unicase.randrange(len(_UNICASE_PAIRS))]
        if a not in tables and b not in tables:
            tables[0], tables[-1] = a, b
    # full quoted ids; `tables` entries stay the unique generator KEYS
    full_id = {t: f'"SYSTEM"."{t}"' for t in tables}
    if multischema_prob:
        pool = ["APP", "DW", "STAGE"]
        for t in tables:
            if rng_schema.random() < multischema_prob:
                full_id[t] = f'"{rng_schema.choice(pool)}"."{t}"'
        if len(tables) >= 2 and rng_schema.random() < 0.8:
            # bare-name collision: last table takes table 0's bare name
            # under a schema distinct from table 0's current one
            t0_schema = full_id[tables[0]].split(".")[0].strip('"')
            sch = rng_schema.choice(
                [s for s in ["SYSTEM", *pool] if s != t0_schema]
            )
            full_id[tables[-1]] = f'"{sch}"."{tables[0]}"'
    specs: dict[str, dict[str, _ColSpec]] = {}
    id_values: dict[str, list[str]] = {t: [] for t in tables}
    cols_of: dict[str, list[str]] = {}

    ins_cols: dict[str, list[str]] = {}
    for ti, t in enumerate(tables):
        id_kind = rng.choice(["seq", "seqpad", "seq", "dup"])
        tcols: dict[str, _ColSpec] = {"ID": _ColSpec(id_kind, rng)}
        if ti > 0 and rng.random() < 0.8:
            parent = tables[rng.randrange(ti)]
            tcols[f"{parent}_ID"] = _ColSpec(
                "fk", rng, parent_ids=id_values[parent]
            )
        uni_col = list(_UNI_COL_POOL)
        rng_names.shuffle(uni_col)
        meta_col = list(_META_COL_POOL)
        rng_meta.shuffle(meta_col)
        ridcol_done = False
        for extra, kind in (("NAME", "name"), ("STATE", "state"),
                            ("AMOUNT", "dup")):
            if rng.random() < 0.5:
                if (kind == "name" and uni_prob
                        and rng_axis.random() < uni_prob):
                    kind = "uname"
                if (uni_name_prob
                        and rng_names.random() < uni_name_prob):
                    extra = uni_col.pop()
                if (meta_name_prob
                        and rng_meta.random() < meta_name_prob):
                    extra = meta_col.pop()
                if (ridcol_prob and not ridcol_done
                        and rng_ridcol.random() < ridcol_prob):
                    extra, ridcol_done = "ROWID", True
                tcols[extra] = _ColSpec(kind, rng)
        ins_cols[t] = list(tcols)
        # LATE-BORN column (round 4): never in any insert — introduced
        # only by a later UPDATE on an already-existing table, the shape
        # that exercises the reference's table-birth FK gate (a shallow
        # previousSchema clone makes its column-level clauses vacuous —
        # see inclusion_dependencies_eager). FK-shaped values when
        # possible so inclusion actually holds and a wrong gate would
        # change the schema dump.
        if rng.random() < 0.4:
            if ti > 0 and rng.random() < 0.6:
                parent = tables[rng.randrange(ti)]
                tcols["LATE"] = _ColSpec("fk", rng,
                                         parent_ids=id_values[parent])
            else:
                tcols["LATE"] = _ColSpec(
                    rng.choice(["dup", "state"]), rng)
        cols_of[t] = list(tcols)
        specs[t] = tcols

    # Build per-row op queues (parents first so FK pools are populated).
    queues: list[list[Stmt]] = []
    for ti, t in enumerate(tables):
        tcols = specs[t]
        n_rows = rng.randint(3, 14)
        for r in range(n_rows):
            rid = _rowid(f"F{seed % 997}{t[:2]}", r)
            if rid_style == "hash":
                # '#'-bearing source ids, rotating the nasty shapes.
                # All stay length 18 except the trailing-'#2' one (20)
                # — base ids are never ids themselves, so no literal id
                # can equal another id + '#<digits>' (the engine's
                # collision raise stays un-triggered; a COLLIDING log
                # is pinned separately in tests/test_xes_sink.py)
                v = r % 4
                if v == 0:
                    rid = rid[:9] + "#" + rid[10:]
                elif v == 1:
                    rid = rid[:6] + "##" + rid[8:]
                elif v == 2:
                    rid = "#" + rid[1:]
                else:
                    rid = rid + "#2"
            elif rid_style == "numeric":
                rid = f"{seed % 997}{ti}{r:03d}"
            ops: list[Stmt] = []

            def spawn() -> dict[str, str]:
                st = {c: tcols[c].fresh(rng) for c in ins_cols[t]}
                if "ID" in st:
                    id_values[t].append(st["ID"])
                cols_r, vals_r = list(ins_cols[t]), list(st.values())
                if dup_col_prob and rng_axis.random() < dup_col_prob:
                    # duplicate-column axis: same name twice, two values;
                    # the reference's HashMap fold keeps the LAST one, so
                    # the row state (and later update old-value chains)
                    # tracks the second value
                    i = rng_axis.randrange(len(cols_r))
                    c2 = cols_r[i]
                    v2 = tcols[c2].fresh(rng_axis)
                    j = rng_axis.randrange(i + 1, len(cols_r) + 1)
                    cols_r.insert(j, c2)
                    vals_r.insert(j, v2)
                    st[c2] = v2
                    if c2 == "ID":
                        id_values[t].append(v2)
                ops.append(_ins(full_id[t], rid, cols_r, vals_r))
                return st

            state = spawn()
            if "LATE" in tcols and rng.random() < 0.5:
                v = tcols["LATE"].fresh(rng)
                ops.append(_upd(full_id[t], rid, "LATE", v, "0"))
                state["LATE"] = v
            for _ in range(rng.randint(0, 3)):
                upd_pool = [c for c in state
                            if c != "ID" or rng.random() < 0.15]
                if not upd_pool:
                    continue
                c = rng.choice(upd_pool)
                new = tcols[c].next_update(rng, state[c])
                if new == state[c]:
                    continue
                ops.append(_upd(full_id[t], rid, c, new, state[c]))
                state[c] = new
                if c == "ID":
                    id_values[t].append(new)
            if rng.random() < 0.35:
                ops.append(
                    _del(full_id[t], rid, state, rng.random() < 0.7, rng)
                )
                roll = rng.random()
                if roll < 0.35:
                    state = spawn()  # ROWID-reuse restart
                    if rng.random() < 0.5:
                        c = rng.choice(list(state))
                        new = tcols[c].next_update(rng, state[c])
                        if new != state[c]:
                            ops.append(_upd(full_id[t], rid, c, new, state[c]))
                elif roll < 0.45:
                    # statement-after-delete restart via update
                    c = rng.choice(list(state))
                    ops.append(
                        _upd(full_id[t], rid, c, tcols[c].fresh(rng), state[c])
                    )
            queues.append(ops)

    # Random merge preserving per-row order.
    stmts: list[Stmt] = []
    live = [q for q in queues if q]
    while live:
        q = live[rng.randrange(len(live))]
        stmts.append(q.pop(0))
        if not q:
            live.remove(q)
    return stmts, [full_id[t] for t in tables]


def fuzz_records(
    seed: int, start: datetime = datetime(2020, 7, 21, 16, 29, 41),
    **gen_kwargs,
) -> tuple[list[tuple[Stmt, datetime]], list[str]]:
    """(statement, timestamp) pairs with 0-2 s steps (equal-ts ties
    common), plus the table ids. Shared by the file-mode renderer and
    the documents-mode frame so both inputs carry identical events."""
    stmts, tables = fuzz_statements(seed, **gen_kwargs)
    rng = random.Random(seed * 31 + 7)
    ts = start
    records = []
    for s in stmts:
        ts = ts + timedelta(seconds=rng.choice([0, 0, 1, 1, 2]))
        records.append((s, ts))
    return records, tables


def _smart_schedule(i: int) -> datetime:
    """Strictly increasing instants that all have a SMART-aliasable
    rendering (ts_style='smart'): per 4-record cycle over SHORT months,
    [month-end 00:00, month-end 10:00:ss, 1st-of-next 00:00,
    1st-of-next 09:30:ss]. The midnights render as '<day> 24:00:00'
    (incl. the cap-then-roll '31-FEB-2024 24:00:00' shape) and the
    month-ends as over-length days ('31-APR'), so the resolved values
    keep file order while the STRINGS are all java.time-SMART-only."""
    import calendar

    months = [(2023, 2), (2024, 2), (2024, 4), (2024, 6), (2024, 9),
              (2024, 11)]
    cyc, slot = divmod(i, 4)
    y, m = months[cyc % len(months)]
    y += 2 * (cyc // len(months))
    last = calendar.monthrange(y, m)[1]
    if slot == 0:
        return datetime(y, m, last)
    if slot == 1:
        return datetime(y, m, last, 10, 0, i % 60)
    nxt = datetime(y, m, last) + timedelta(days=1)
    if slot == 2:
        return nxt
    return nxt.replace(hour=9, minute=30, second=i % 60)


def _fmt_ts_styled(ts: datetime, i: int, ts_style: str) -> str:
    """Render one timestamp under a style axis (per-record deterministic):
    'default' = the reference's dd-MMM-yyyy with UPPER month;
    'mixedcase' = same pattern, month casing rotates upper/lower/title
    (the reference formatter is parseCaseInsensitive,
    parser/package.scala:13-16);
    'iso' = yyyy-MM-dd HH:mm:ss (run the binary with --timestampPattern
    'yyyy-MM-dd HH:mm:ss' and the engine with the matching
    ts_format_java)."""
    if ts_style == "iso":
        return ts.strftime("%Y-%m-%d %H:%M:%S")
    if ts_style == "mixedcase":
        mon = ts.strftime("%b")
        styled = (mon.upper(), mon.lower(), mon)[i % 3]
        return ts.strftime("%d-%b-%Y %H:%M:%S").replace(mon, styled)
    if ts_style == "default":
        return _fmt_ts(ts)
    if ts_style == "smart":
        import calendar

        def fmt(day: int, base: datetime, hms: str) -> str:
            mon = base.strftime("%b").upper()
            return f"{day:02d}-{mon}-{base.year} {hms}"

        if (ts.hour, ts.minute, ts.second) == (0, 0, 0):
            # midnight = previous day rendered 24:00:00; when the
            # previous day is a month END, rotate the written day up to
            # 31 — the cap-then-roll shape ('31-FEB-2024 24:00:00')
            prev = ts - timedelta(days=1)
            plast = calendar.monthrange(prev.year, prev.month)[1]
            day = prev.day if prev.day < plast else plast + (
                i % (32 - plast))
            return fmt(day, prev, "24:00:00")
        last = calendar.monthrange(ts.year, ts.month)[1]
        if ts.day == last and last < 31:
            # month-end rendered with an over-length day (SMART caps)
            return fmt(last + 1 + (i % (31 - last)), ts,
                       ts.strftime("%H:%M:%S"))
        return _fmt_ts(ts)
    raise ValueError(f"unknown ts_style {ts_style!r}")


# isBlank-true separator lines for ws_style='unicode': every entry is
# blank to String.isBlank (Character.isWhitespace per char) so the
# reference drops it before pairing — 　 ideographic space, \x1c-\x1d
# file/group separators, Zs runs,   LINE SEPARATOR (NOT a line
# break to getLines/BufferedReader — it arrives as a 1-char line),
# ogham   +  . NBSP is deliberately ABSENT: an NBSP-only
# line is NOT blank to Java and shifts the pairing (a reference-crash
# shape, probed — covered by test_unicode_parity instead).
_UNI_SEPS = ["", "\u3000", " \t ", "\x1c\x1d",
             "\u2000\u2009\u200a", "\u2028", "\u1680\u205f",
             "  "]
_STMT_PADS = ("", " ", "\t")  # inside String.trim's <=0x20 set

# crlf axis: scala.io.Source.getLines treats \r\n, lone \r and \n all
# as line terminators (probed vs the binary — a lone-\r classic-Mac log
# parses identically). Rotation covers every adjacency (\r followed by
# \r\n, etc.). The engine twin is sources/logfile._LINE_TERM.
_TERM_POOL = ("\n", "\r\n", "\r", "\r\n", "\n", "\r", "\n")


def _join_lines(lines: list[str], ws_style: str) -> str:
    if ws_style == "crlf":
        return "".join(
            ln + _TERM_POOL[i % len(_TERM_POOL)]
            for i, ln in enumerate(lines)
        )
    return "\n".join(lines) + "\n"


def render_log(
    records: list[tuple[Stmt, datetime]], ts_style: str = "default",
    ws_style: str = "plain",
) -> str:
    """Reference file layout: 2-line chunks + whitespace-only separator
    lines, trailing-space noise. ws_style='unicode' swaps the separator
    lines for the _UNI_SEPS pool (all String.isBlank), pads statements
    with \\t as well as spaces, and inserts an occasional blank line
    BETWEEN a statement line and its id line. ws_style='crlf' keeps
    plain separators but rotates the line terminator through
    \\n / \\r\\n / \\r (_TERM_POOL — getLines treats all three alike)."""
    out: list[str] = []
    uni = ws_style == "unicode"
    for i, (s, ts) in enumerate(records):
        pad = _STMT_PADS[i % 3] if uni else " " * (i % 3)
        out.append(s.statement + pad)
        if uni and i % 5 == 2:
            out.append(_UNI_SEPS[(i + 3) % len(_UNI_SEPS)])
        out.append(
            f"{s.row_id} {' ' * (i % 2)}{_fmt_ts_styled(ts, i, ts_style)}"
            .ljust(80)
        )
        out.append(_UNI_SEPS[i % len(_UNI_SEPS)] if uni else " " * (i % 2))
    return _join_lines(out, ws_style)


def records_to_documents(records: list[tuple[Stmt, datetime]]):
    """Documents-table shape (the production input): one 2-line record
    per text cell, warc_ts = the record's own timestamp, url zero-padded
    so (warc_ts, url) ordering == statement order (the BASELINE.json
    input_hint contract)."""
    import pandas as pd

    rows = []
    for seq, (s, ts) in enumerate(records):
        text = f"{s.statement}\n{s.row_id} {_fmt_ts(ts)}".ljust(80)
        rows.append({
            "url": f"https://fuzz.example/{seq:08d}",
            "warc_ts": ts,
            "html": b"",
            "text": text,
            "lang": "en",
        })
    return pd.DataFrame(rows)


def records_to_packed_documents(
    records: list[tuple[Stmt, datetime]], seed: int,
    ws_style: str = "plain",
):
    """Multi-statement-per-doc axis: consecutive records packed 1-5 per
    text cell (with blank/whitespace separator noise between chunks,
    which the reference chunker drops — FileParser.scala:22). Exploding
    with sources.logfile.explode_log_records and parsing must equal the
    one-record-per-doc frame. warc_ts = FIRST packed record's ts; urls
    zero-padded by first record seq, so after exploding (which appends a
    zero-padded '#kkkk' position suffix) (warc_ts, url) ordering is
    again exactly statement order. ws_style='unicode' draws the
    separator noise from the _UNI_SEPS isBlank pool and pads statements
    from _STMT_PADS — exercising explode_log_records' String.isBlank
    line drop (javaspace.not_blank_line) on unicode separators.
    ws_style='crlf' joins the packed cell's lines with the rotating
    \\n / \\r\\n / \\r terminator pool — exercising explode_log_records'
    getLines-faithful line split (sources/logfile._LINE_TERM)."""
    import pandas as pd

    uni = ws_style == "unicode"
    rng = random.Random(seed * 977 + 3)
    rows, i = [], 0
    while i < len(records):
        k = rng.randint(1, 5)
        chunk_lines = []
        for j, (s, ts) in enumerate(records[i:i + k]):
            if j and rng.random() < 0.5:
                chunk_lines.append(
                    _UNI_SEPS[rng.randrange(len(_UNI_SEPS))] if uni
                    else " " * rng.randrange(3))  # separator noise
            pad = _STMT_PADS[j % 3] if uni else " " * (j % 2)
            chunk_lines.append(s.statement + pad)
            chunk_lines.append(f"{s.row_id} {_fmt_ts(ts)}".ljust(78))
        rows.append({
            "url": f"https://fuzz.example/{i:08d}",
            "warc_ts": records[i][1],
            "html": b"",
            "text": ("\n".join(chunk_lines) if ws_style != "crlf"
                     else _join_lines(chunk_lines, ws_style)),
            "lang": "en",
        })
        i += k
    return pd.DataFrame(rows)


def write_fuzz_log(
    seed: int, path: str, ts_style: str = "default",
    ws_style: str = "plain", **gen_kwargs
) -> list[str]:
    """Generate, render and write the seed's log; return its table ids."""
    records, tables = fuzz_records(seed, **gen_kwargs)
    if ts_style == "smart":
        # replace the second-step schedule with SMART-aliasable instants
        # (month ends + midnights); rendering stays order-preserving
        records = [(s, _smart_schedule(i))
                   for i, (s, _ts) in enumerate(records)]
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_log(records, ts_style, ws_style))
    return tables
