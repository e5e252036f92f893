"""Plans: similarity (filled in incrementally)."""
