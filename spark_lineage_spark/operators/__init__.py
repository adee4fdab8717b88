"""Operator/query library — one module per SURVEY.md §2 category."""
