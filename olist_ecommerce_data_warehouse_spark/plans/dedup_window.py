"""Plans: dedup_window (filled in incrementally)."""
