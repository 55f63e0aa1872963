"""Placeholder — filled in as the similarity surface lands (SURVEY.md §7)."""
