"""Sinks: fan-out by op, XES traces, lineage/metrics with resume."""
