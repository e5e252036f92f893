"""Plans: events (filled in incrementally)."""
