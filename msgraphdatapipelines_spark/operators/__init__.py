"""Engine operators (SURVEY.md §2.3 transforms + §2.5 extensions)."""
