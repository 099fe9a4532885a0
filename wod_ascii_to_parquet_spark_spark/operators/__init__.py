"""Operator library backing the registry (SURVEY.md §2 inventory)."""
