"""Structured Streaming surface (SURVEY.md §2c "Streaming" — absent
from the batch-only reference; extension on the events table)."""
