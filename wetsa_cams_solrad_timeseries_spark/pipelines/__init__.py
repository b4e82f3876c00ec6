"""The three reference pipelines (SURVEY.md §3 EP1–EP3), Spark-first."""
