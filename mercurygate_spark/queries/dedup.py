"""Placeholder — filled in as the dedup surface lands (SURVEY.md §7)."""
