"""Plans: cleansing (filled in incrementally)."""
