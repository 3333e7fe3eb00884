"""Helper: run the ACTUAL reference implementation in-sandbox.

The reference (fyndalf/redo-log-parser) is Scala 2.12; its non-CLI
sources compile against scala-library + scala-xml only (the `decline`
CLI dependency is unavailable offline, so tests/fixtures/RefDriver*.scala
replay cli/Main.scala's pipeline calls non-interactively — see
tests/fixtures/README.md for the capture protocol).

This module locates (or rebuilds) that in-sandbox build and exposes
`run_reference(...)` for differential tests: write a log, run the real
binary, compare its schema dump / .xes bytes against the Spark engine.
Everything degrades to pytest.skip when the Scala toolchain is absent.
"""

from __future__ import annotations

import glob
import os
import subprocess

BUILD_DIR = "/tmp/refbuild"
CLASSES = os.path.join(BUILD_DIR, "classes")
REFERENCE_SRC = "/root/reference/src/main/scala"
_SCALA_LIB_DIRS = [
    "/root/.sbt/boot/scala-2.12.19/lib",
]
_FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _find_jar(name: str) -> str | None:
    for d in _SCALA_LIB_DIRS:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def _runtime_classpath() -> str | None:
    lib = _find_jar("scala-library.jar")
    xml = _find_jar("scala-xml_2.12-2.2.0.jar")
    if lib is None or xml is None:
        return None
    return os.pathsep.join([CLASSES, lib, xml])


def ensure_reference_build() -> str | None:
    """Return the runtime classpath for RefDriver*, rebuilding the
    reference + driver classes under /tmp/refbuild if missing.
    None when the Scala toolchain isn't available (caller skips)."""
    cp = _runtime_classpath()
    if cp is None or not os.path.isdir(REFERENCE_SRC):
        return None
    if os.path.exists(os.path.join(CLASSES, "RefDriver3.class")):
        return cp
    compiler = _find_jar("scala-compiler.jar")
    reflect = _find_jar("scala-reflect.jar")
    lib = _find_jar("scala-library.jar")
    xml = _find_jar("scala-xml_2.12-2.2.0.jar")
    if compiler is None or reflect is None:
        return None
    os.makedirs(CLASSES, exist_ok=True)
    sources = [
        p for p in glob.glob(f"{REFERENCE_SRC}/**/*.scala", recursive=True)
        if not p.endswith("Main.scala")  # needs the absent `decline` dep
    ] + sorted(glob.glob(os.path.join(_FIXTURES, "*.scala")))
    cmd = [
        "java", "-cp", os.pathsep.join([compiler, reflect, lib]),
        "scala.tools.nsc.Main",
        "-classpath", os.pathsep.join([xml, lib]),
        "-d", CLASSES,
    ] + sources
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if res.returncode != 0:
        raise RuntimeError(f"reference build failed:\n{res.stderr[-4000:]}")
    return cp


def run_reference(
    log_path: str,
    root: str,
    out_path: str,
    ts_pattern: str = "",
    strict: bool = False,
    updvals: bool = False,
    timeout: int = 120,
    utf8: bool = False,
) -> tuple[str, str | None]:
    """Run the real reference pipeline (RefDriver3) on `log_path`.

    root='-' skips trace/XES generation. Returns (schema_dump_text,
    xes_text_or_None). Raises on a non-zero exit (the caller decides
    whether a reference crash is itself the expected behavior).

    utf8=True launches the JVM with -Dfile.encoding=UTF-8 so
    Source.fromFile (FileReader.scala:18, default charset) decodes the
    log as UTF-8 — the sandbox JVM defaults to US-ASCII, which mangles
    every non-ASCII byte to U+FFFD. The unicode fuzz axis pins parity
    against the UTF-8-locale configuration any real deployment runs."""
    cp = ensure_reference_build()
    assert cp is not None, "reference build unavailable"
    flags = [f for f, on in (("strict", strict), ("updvals", updvals)) if on]
    enc = ["-Dfile.encoding=UTF-8"] if utf8 else []
    cmd = ["java", *enc, "-cp", cp, "RefDriver3", log_path, root, out_path,
           ts_pattern] + flags
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if res.returncode != 0:
        raise RuntimeError(
            f"reference run failed ({' '.join(cmd)}):\n{res.stderr[-4000:]}"
        )
    schema = open(out_path + ".schema.txt", encoding="utf-8").read()
    xes = None
    if root != "-":
        xes = open(out_path, encoding="utf-8").read()
    return schema, xes


def _canon_line(line: str) -> str:
    """Canonicalize one console column line: multiple FK targets are
    joined with ' AND ' in Scala-HashMap iteration order over the other
    tables/columns (SchemaDeriver.scala:58-66 — an implementation
    artifact like table order), so sort them for comparison."""
    line = line.rstrip()
    marker = "FK CANDIDATE FOR: "
    if marker not in line:
        return line
    head, targets = line.split(marker, 1)
    return head + marker + " AND ".join(sorted(targets.split(" AND ")))


def parse_schema_dump(s: str) -> dict[str, set[str]]:
    """Split a reference console schema dump into {table: set(column
    lines)} — the reference emits Scala-HashMap iteration order for
    tables, columns AND multi-FK target lists, so all golden comparisons
    are order-free at each level."""
    tables: dict[str, set[str]] = {}
    cur = None
    for line in s.splitlines():
        if not line.strip():
            continue
        if line.startswith("TABLE "):
            cur = line[6:].rstrip()
            tables[cur] = set()
        else:
            tables[cur].add(_canon_line(line))
    return tables
