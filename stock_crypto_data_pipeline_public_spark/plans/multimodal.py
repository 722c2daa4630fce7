"""Multimodal binary-column plumbing. Filled in next."""
