"""Plans: text (filled in incrementally)."""
