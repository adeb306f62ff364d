"""Sources: change-log readers and raw-feed normalizers (SURVEY.md §2.1)."""
