"""Replica of Scala 2.12 `groupBy` map-iteration order over String keys.

The reference's document-level trace order in the `.xes` log is an
implementation artifact: `TraceIDParserHelper.gatherRootLogBuckets`
walks `logEntries.groupBy(_.rowID)` (TraceIDParser.scala:46-57 /
TraceIDParserHelper.scala:19-25), and Scala 2.12's `groupBy` returns an
`immutable.Map`. For more than 4 distinct keys that is the 2.12
`immutable.HashMap` hash-array-mapped trie, whose iteration order is a
PURE FUNCTION of the key strings — independent of insertion order and
of the JVM (String.hashCode is specified by the JLS; the trie layout by
the Scala 2.12 source):

  * per key: h = improve(String.hashCode) — the 2.12 immutable-HashMap
    bit-mix (HashMap.scala `improve`: h + ~(h<<9), ^>>>14, +<<4, ^>>>10);
  * the trie branches on 5-bit chunks of h, LEAST-significant first
    ((h >>> 5*level) & 0x1f), children stored in ascending chunk order;
  * the iterator is a depth-first walk, so iteration order is the
    lexicographic order of each key's chunk tuple;
  * keys with IDENTICAL improved hashes (e.g. "Aa" vs "BB") live in a
    ListMap collision node in FIRST-INSERTION order (2.12 ListMap
    prepends updates, and its iterator reverses the backing list).

For 1-4 distinct keys `groupBy` yields scala.collection.immutable
Map1..Map4, which iterate in insertion order — and the OBSERVED order
on this toolchain is FIRST-APPEARANCE of the keys (probed directly:
30/30 randomized 2-4-key `groupBy` runs against the in-sandbox
2.12.19 compiler match first-appearance). scala212_groupby_order
returns exactly that for <=4 keys; the mutable-HashTable replica
(byteswap32 seed-rotated bucket index, per-bucket prepend,
high-bucket-first iteration: mutable/HashTable.scala) is used ONLY as
the collision tie-break in the >4-key HAMT regime. Do not "fix" the
<=4 branch to walk the mutable map — that would break byte parity on
small root tables; see scala212_groupby_order's docstring.

Validated against the actual reference toolchain: the in-sandbox
Scala 2.12.19 probe (tests/test_reference_trace_order.py) compares this
module's order with a compiled `groupBy` over randomized key sets,
including engineered hash collisions, and the whole-file `.xes` byte
golden passes with plain diff once traces are emitted in this order.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def java_string_hash(s: str) -> int:
    """JLS String.hashCode over UTF-16 code units, as unsigned 32-bit."""
    h = 0
    for unit in _utf16_units(s):
        h = (31 * h + unit) & _M32
    return h


def _utf16_units(s: str):
    for ch in s:
        cp = ord(ch)
        if cp < 0x10000:
            yield cp
        else:  # surrogate pair
            cp -= 0x10000
            yield 0xD800 + (cp >> 10)
            yield 0xDC00 + (cp & 0x3FF)


def improve_immutable(hcode: int) -> int:
    """scala.collection.immutable.HashMap#improve (2.12)."""
    h = (hcode + (~(hcode << 9) & _M32)) & _M32
    h ^= h >> 14
    h = (h + ((h << 4) & _M32)) & _M32
    h ^= h >> 10
    return h


def hamt_order_key(key: str) -> tuple:
    """Sort key reproducing 2.12 immutable.HashMap DFS iteration order
    (valid for maps with >4 entries; equal tuples = hash collision —
    break ties by insertion order, see scala212_groupby_order)."""
    h = improve_immutable(java_string_hash(key))
    return tuple((h >> (5 * lvl)) & 0x1F for lvl in range(7))


def byteswap32(v: int) -> int:
    """scala.util.hashing.byteswap32 (unsigned 32-bit)."""
    hc = (v * 0x9E3775CD) & _M32
    hc = int.from_bytes(hc.to_bytes(4, "big"), "little")  # reverseBytes
    return (hc * 0x9E3775CD) & _M32


class _MutableHashTableReplica:
    """Order-faithful replica of 2.12 mutable.HashMap's HashTable:
    byteswap32 improve rotated by tableSizeSeed, index from the HIGH
    bits, per-bucket PREPEND on insert, resize x2 at count > 0.75*len
    (re-inserting each old bucket in chain order at the new index,
    which REVERSES chains that stay together), iteration from the last
    populated bucket DOWN to 0, each chain head-first."""

    # seedvalue is assigned ONCE at construction (tableSizeSeed of the
    # initial 16-slot table = bitCount(15) = 4) and never recomputed on
    # resize — HashTable.scala keeps the var untouched in resize()
    _SEED = 4

    def __init__(self):
        self.table: list[list[str]] = [[] for _ in range(16)]
        self.count = 0

    def _index(self, hcode: int) -> int:
        ones = len(self.table) - 1
        exponent = 32 - ones.bit_length()
        i = byteswap32(hcode)
        rot = self._SEED % 32
        rotated = ((i >> rot) | (i << (32 - rot))) & _M32
        return (rotated >> exponent) & ones

    def add(self, key: str) -> None:
        idx = self._index(java_string_hash(key))
        bucket = self.table[idx]
        if key in bucket:
            return
        bucket.insert(0, key)
        self.count += 1
        if self.count > (len(self.table) * 750) // 1000:
            self._resize()

    def _resize(self) -> None:
        old = self.table
        self.table = [[] for _ in range(len(old) * 2)]
        # HashTable.resize walks the OLD table from the END down and
        # re-prepends each chain head-first into the new table
        for i in range(len(old) - 1, -1, -1):
            for key in old[i]:
                self.table[self._index(java_string_hash(key))].insert(0, key)

    def iteration_order(self) -> list[str]:
        out: list[str] = []
        for i in range(len(self.table) - 1, -1, -1):
            out.extend(self.table[i])
        return out


def scala212_groupby_order(keys_in_first_seen_order: list[str]) -> list[str]:
    """The iteration order of `xs.groupBy(f)` in Scala 2.12 given the
    distinct keys in FIRST-APPEARANCE order.

    Empirically pinned against the in-sandbox Scala 2.12.19 toolchain
    (the same build that produced the reference goldens):

      * <=4 distinct keys (Map1..Map4): FIRST-APPEARANCE order;
      * >4 keys (immutable.HashMap trie): chunk-tuple order, with
        equal-improved-hash keys (collision ListMap nodes) ordered by
        the MUTABLE HashTable replica's iteration order — 0/40
        collision-heavy trials disagree, vs 15+/40 for every other
        tie-break tried (first-seen fwd/rev, mutable rev).

    The two regimes look inconsistent (different internal insertion
    orders) but both are directly observed behavior of `groupBy` on
    this exact toolchain; hash collisions need two different keys with
    identical 32-bit improved hashes, which real ROWID strings
    essentially never produce — the tie-break exists for completeness."""
    distinct = list(dict.fromkeys(keys_in_first_seen_order))
    if len(distinct) <= 4:
        return distinct
    ht = _MutableHashTableReplica()
    for k in distinct:
        ht.add(k)
    pos = {k: i for i, k in enumerate(ht.iteration_order())}
    return sorted(distinct, key=lambda k: (hamt_order_key(k), pos[k]))


class JavaRandom:
    """java.util.Random LCG (the JDK-specified algorithm), enough for
    nextInt(bound) — scala.util.Random delegates to it."""

    _MASK = (1 << 48) - 1

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & self._MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & self._MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound & (bound - 1) == 0:
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val


# scala.util.Random.alphanumeric's alphabet in 2.12 — UPPERCASE first
# (pinned against the in-sandbox toolchain: seeded blocks
# Gpi2/C7Dg/XDiA/M66y... at seed 42)
_SCALA_ALPHANUMERIC = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)


class ScalaRandomAlphanumeric:
    """Replica of `scala.util.Random.alphanumeric.take(4).mkString`
    consumption after setSeed(seed): each block draws exactly 4
    nextInt(62) values from the shared generator."""

    def __init__(self, seed: int = 42):
        self._rng = JavaRandom(seed)

    def next_block(self, n: int = 4) -> str:
        return "".join(
            _SCALA_ALPHANUMERIC[self._rng.next_int(62)] for _ in range(n)
        )


def reference_row_id_map(
    events_in_log_order: list[tuple[str, str]], seed: int = 42
) -> dict[tuple[str, int], str]:
    """Replay EventExtractor.transformRowIdentifiers/generateNewRowID
    (EventExtractor.scala:27-111) over (orig_row_id, op) pairs in log
    order, with the seeded suffix stream the reference CLI run used
    (tests/fixtures/RefDriver.scala sets Random.setSeed(42)).

    Returns {(orig_row_id, incarnation_k): reference_row_id} — the
    bridge from this engine's deterministic `orig#k` incarnation ids
    (SURVEY §1.3.3) to the reference's random `orig_XXXX` ids, which is
    what the reference's trace ORDER hashes on. Restart boundaries are
    identical by construction (insert-on-known OR statement-after-
    delete — the parity-pinned rule), so only the suffix STRING
    differs."""
    rng = ScalaRandomAlphanumeric(seed)
    lookup: dict[str, str] = {}          # orig -> current reference id
    saw_delete: dict[str, bool] = {}     # reference id -> delete seen
    incarnation: dict[str, int] = {}     # orig -> current k
    out: dict[tuple[str, int], str] = {}

    def restart(orig: str) -> str:
        new = orig
        # the while ALWAYS fires once (orig is a lookup key); extra
        # iterations only on a 62^-4 suffix collision, like the source
        while new in lookup or new in lookup.values():
            new = new + "_" + rng.next_block()
        lookup[orig] = new
        incarnation[orig] = incarnation.get(orig, 0) + 1
        return new

    for orig, op in events_in_log_order:
        if orig not in lookup:
            lookup[orig] = orig
            incarnation[orig] = 0
            current = orig
        elif op == "insert":
            current = restart(orig)
        elif not saw_delete.get(lookup[orig], False):
            current = lookup[orig]
        else:
            current = restart(orig)
        if op == "delete":
            saw_delete[current] = True
        else:
            saw_delete.setdefault(current, False)
        out[(orig, incarnation[orig])] = current
    return out
