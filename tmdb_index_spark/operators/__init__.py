"""Relational operators re-expressed as Catalyst plans (SURVEY.md §2)."""
