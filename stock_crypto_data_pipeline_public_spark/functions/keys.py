"""Data Vault hash-key functions.

Reproduces the two key-generation schemes the reference uses everywhere:

- ``hash_key``: SHA-256 over ``'||'``-joined, empty-string-coalesced varchar
  casts (reference macros/hash_key.sql:1-12).
- ``surrogate_key``: MD5 over ``'-'``-joined coalesced casts — the semantics of
  dbt_utils.generate_surrogate_key (used at e.g. reference
  models/warehouse/hubs/hub_customer.sql:26).

Column ORDER matters (reference macros/macro.yml:75). Both are pure built-in
column expressions → JVM-side, whole-stage-codegen'd, no UDF. To keep hashes
engine-portable (Spark == DuckDB == Snowflake), only hash string/int-typed
columns or cast explicitly to a canonical string first; float/timestamp
renderings differ across engines (SURVEY.md §7 "hash-key fidelity").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


#: dbt_utils.generate_surrogate_key's NULL placeholder — a distinct sentinel
#: so NULL and '' produce different keys (an attribute flipping between the
#: two must register as a hashdiff change; a bare '' coalesce would collide)
NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def _as_str(c, null_as: str = "") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(c.cast("string"), F.lit(null_as))


def hash_key(*cols) -> Column:
    """SHA-256 hub/link key: sha2(concat_ws('||', ...), 256), NULL → ''
    (reference macros/hash_key.sql:1-12 coalesces to empty string)."""
    return F.sha2(F.concat_ws("||", *[_as_str(c) for c in cols]), 256)


def surrogate_key(*cols) -> Column:
    """MD5 surrogate key (dbt_utils.generate_surrogate_key semantics,
    including its NULL sentinel)."""
    return F.md5(F.concat_ws("-", *[_as_str(c, NULL_SENTINEL) for c in cols]))


def oracle_hash_key(*cols: str) -> str:
    """DuckDB/ANSI SQL fragment equivalent of :func:`hash_key` (for oracles)."""
    inner = ", ".join(f"coalesce(cast({c} as varchar), '')" for c in cols)
    return f"sha256(concat_ws('||', {inner}))"


def oracle_surrogate_key(*cols: str) -> str:
    """DuckDB/ANSI SQL fragment equivalent of :func:`surrogate_key`."""
    inner = ", ".join(
        f"coalesce(cast({c} as varchar), '{NULL_SENTINEL}')" for c in cols
    )
    return f"md5(concat_ws('-', {inner}))"
