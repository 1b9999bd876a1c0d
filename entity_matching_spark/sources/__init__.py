"""Data sources: deterministic synthetic corpora and IO helpers."""
