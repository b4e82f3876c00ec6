"""Engine operators (SURVEY.md §2 inventory + LLM-pipeline extensions)."""
