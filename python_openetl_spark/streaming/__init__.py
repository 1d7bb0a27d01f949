"""Structured Streaming operators: windows, watermark dedup, upsert sinks."""
