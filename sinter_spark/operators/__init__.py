"""Table-level data-quality and pipeline operators (SURVEY.md §2.8)."""
