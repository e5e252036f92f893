"""Relational/dataflow operators (SURVEY.md §2.4–§2.6 + extensions)."""
