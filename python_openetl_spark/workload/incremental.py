"""Placeholder — filled in by later milestone."""

QUERIES = {}
ORACLE = {}
