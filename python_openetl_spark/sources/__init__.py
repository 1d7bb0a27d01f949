"""Pluggable sources: parquet/CSV files, tarballs, JDBC, BigQuery (gated)."""
