"""Relational operator demos + training-data-pipeline operators with
DuckDB-checkable oracle SQL (driver contract, SURVEY.md §2)."""
