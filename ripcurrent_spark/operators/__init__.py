"""Distributed operators beyond the relational core: dedup, text
analytics, similarity search, as-of/sessionize helpers."""
