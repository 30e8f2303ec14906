"""Operators: the reference's dataflow/query surface re-expressed as
Catalyst-planned DataFrame programs (SURVEY.md §2A/§2B)."""
