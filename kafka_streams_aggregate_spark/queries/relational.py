"""Relational query corpus (SURVEY.md §2.3 / Phase 2). Populated incrementally."""
