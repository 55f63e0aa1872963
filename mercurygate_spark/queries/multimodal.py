"""Placeholder — filled in as the multimodal surface lands (SURVEY.md §7)."""
