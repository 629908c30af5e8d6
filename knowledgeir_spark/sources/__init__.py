"""Readers/writers for the reference's interchange formats (SURVEY.md §2.1)."""
