"""Training-data-pipeline functions: text analysis, deduplication,
similarity search (beyond-reference mandate — SURVEY.md §7 step 7)."""
