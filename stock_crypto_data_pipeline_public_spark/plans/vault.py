"""Data Vault 2.0 / mart layer queries (SURVEY.md §2.1, §2.8). Filled in next."""
