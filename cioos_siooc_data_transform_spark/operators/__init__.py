"""Relational + large-scale pipeline operators (SURVEY.md §2.2-2.6 and the
beyond-reference LLM-data-pipeline operators)."""
