"""Pipeline runner and medallion models (SURVEY.md §3, §7)."""
