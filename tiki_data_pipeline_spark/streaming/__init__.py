"""Structured Streaming variants of the incremental operators
(SURVEY.md §2.10)."""
