"""Structured Streaming variant of parse→route (continuous ingestion)."""
