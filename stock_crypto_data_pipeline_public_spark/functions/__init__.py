from .keys import hash_key, surrogate_key  # noqa: F401
