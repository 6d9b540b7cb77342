"""Scalar function library (SURVEY.md §2.8) and text analysis (§2.11)."""
