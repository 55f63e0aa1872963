"""Medallion pipeline: bronze ingest → silver conform → run ledger.

Pure-function re-design of the reference notebooks (SURVEY.md §3
"New-engine lifecycle"): ``ingest`` and ``conform`` build lazy
DataFrames; only ``publish`` performs actions.
"""
