"""Pipeline layer: medallion loads, star-schema builders, orchestration
(SURVEY.md §2.9, §3)."""
