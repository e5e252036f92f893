"""Plans: gold (filled in incrementally)."""
