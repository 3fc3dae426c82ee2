"""Placeholder — filled in incrementally."""
