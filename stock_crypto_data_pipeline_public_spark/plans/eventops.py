"""Event-stream batch analytics (SURVEY.md §2.9). Filled in next."""
