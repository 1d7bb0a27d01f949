"""Pipeline verbs (seed / upsert-sync / flat-file ingest) and metrics."""
