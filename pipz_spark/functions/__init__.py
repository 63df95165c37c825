"""Arbitrary-Python escape hatch (the analog of the reference's
user-closure surface, api.go:40-81) — Arrow-batched, never
row-at-a-time, with per-row exception capture."""

from .udf import python_apply, python_flat_map, python_map_batches, sanitize_message

__all__ = ["python_apply", "python_flat_map", "python_map_batches", "sanitize_message"]
