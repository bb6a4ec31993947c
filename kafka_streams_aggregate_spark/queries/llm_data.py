"""LLM-data-pipeline query corpus (SURVEY.md Phase 3). Populated incrementally."""
