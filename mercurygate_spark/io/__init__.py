"""Sources and sinks (SURVEY.md §2a S1-S8, K1-K3)."""
