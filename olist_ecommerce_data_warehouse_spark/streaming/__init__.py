"""Structured Streaming surface (extension tier, SURVEY.md §2.8/§7 E)."""
