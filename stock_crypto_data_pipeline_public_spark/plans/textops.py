"""Text analysis / dedup operators over documents. Filled in next."""
