"""Relational + large-scale-pipeline operators (SURVEY.md §2)."""
