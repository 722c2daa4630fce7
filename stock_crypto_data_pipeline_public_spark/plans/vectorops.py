"""Embedding similarity operators. Filled in next."""
