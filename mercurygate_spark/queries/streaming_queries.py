"""Placeholder — filled in as the streaming_queries surface lands (SURVEY.md §7)."""
