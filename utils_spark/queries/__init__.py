"""Registered query surface — one module per operator family (SURVEY.md §2)."""
