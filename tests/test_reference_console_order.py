"""oracle.reference_console_dump: BYTE-faithful console schema dump —
the last Scala-HashMap-order artifact that was still canonicalized
away. Validated (a) against pinned dumps captured from the in-sandbox
binary (always run) and (b) live against the binary on fuzz logs and
the shipped artifact (skipped without the toolchain)."""

import os

import pytest

from redo_log_parser_spark import oracle
from redo_log_parser_spark.config import PipelineConfig

SCALA_LIB = "/root/.sbt/boot/scala-2.12.19/lib"


def _dump(log_path: str, strict: bool = False, cfg=None) -> str:
    lines = open(log_path, encoding="utf-8").read().splitlines()
    entries = oracle.uniquify_row_ids(
        oracle.parse_log_lines(lines, cfg or PipelineConfig()))
    return oracle.reference_console_dump(entries, strict=strict)


def test_console_dump_matches_pinned_golden():
    """The captured reference dump for artifacts/redo_log.txt must be
    reproduced byte-for-byte — including table order, column order and
    FK-target order (no canonicalization)."""
    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "reference_redo_log_schema.txt")
    got = _dump("/root/reference/artifacts/redo_log.txt")
    assert got == open(fx, encoding="utf-8").read().strip("\n")


def test_console_dump_matches_pinned_strict_golden():
    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "reference_redo_log_schema_strict.txt")
    got = _dump("/root/reference/artifacts/redo_log.txt", strict=True)
    assert got == open(fx, encoding="utf-8").read().strip("\n")


def test_console_dump_matches_binary_on_fuzz_logs(tmp_path):
    """Live differential check on random logs (incl. late-born columns
    from the round-4 generator), plain AND strict."""
    from fuzzgen import write_fuzz_log
    from refbin import ensure_reference_build, run_reference

    try:
        cp = ensure_reference_build()
    except RuntimeError as e:
        pytest.skip(f"reference build failed: {e}")
    if cp is None:
        pytest.skip("Scala toolchain unavailable")

    for seed in (17, 28, 39, 410, 511):
        log = str(tmp_path / f"f{seed}.log")
        write_fuzz_log(seed, log)
        for strict in (False, True):
            ref, _ = run_reference(
                log, "-", str(tmp_path / "x.xes"), strict=strict)
            assert _dump(log, strict) == ref, (seed, strict)
