"""Structured Streaming pieces (metrics rollup; the batch engine's
only streaming surface — the reference is batch-only, SURVEY.md §2.9)."""
