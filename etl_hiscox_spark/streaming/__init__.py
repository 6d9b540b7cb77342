"""Structured Streaming operators (SURVEY.md §2.10 X1-X7)."""
