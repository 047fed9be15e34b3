"""Structured Streaming: incremental file pickup (SURVEY.md §2.9) and
watermarked window aggregations (beyond-reference scope)."""
