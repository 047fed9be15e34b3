"""Sinks: CF-attribute-carrying Parquet writers (SURVEY.md §2.8)."""
