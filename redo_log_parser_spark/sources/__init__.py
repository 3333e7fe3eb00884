"""Sources: documents tables (parquet/Iceberg) and raw redo-log files."""
