"""Plans: llm_dedup (filled in incrementally)."""
