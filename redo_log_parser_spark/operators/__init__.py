"""Distributed operators (SURVEY.md §2.3-2.6) plus the training-data
pipeline operators (dedup / similarity / text analysis)."""
