"""Corpus-level operators: aggregates, dedup family, similarity search."""
