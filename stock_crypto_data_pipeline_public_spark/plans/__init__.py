from .registry import QUERIES, ORACLES, load_all, query  # noqa: F401
