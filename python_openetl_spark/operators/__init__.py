"""Engine operators: incremental maintenance, dedup, similarity, text analysis."""
