"""Engine operators Spark lacks natively (SURVEY.md §2c gaps +
north-star extensions): as-of joins, dedup families, similarity
search, text analysis, sessionization, multimodal plumbing.

Each operator is a plain DataFrame→DataFrame function — composition of
built-in ops first, Arrow-batched pandas UDFs only where built-ins
can't express the semantics (SURVEY.md §4: no custom Catalyst rules
required)."""
