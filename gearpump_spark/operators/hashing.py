"""The engine's cross-engine deterministic hash family, in ONE place.

Every hash-dependent operator (MinHash/LSH banding in dedup.py, Bloom
filters in sketches.py, sampling/splits/packing in sampling.py) derives
from seeded md5 over a UTF-8 `"{seed}|{value}"` string, because both Spark
and DuckDB evaluate it bit-identically — that is what makes those
operators exactly oracle-checkable. Any change here (hex width, separator,
encoding) MUST be mirrored in the SQL templates below and in every
query oracle, or the engines silently diverge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seeded_md5(key: Column, seed: int) -> Column:
    """md5 hex digest of '{seed}|{key}' — the family's raw form."""
    return F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")).cast("binary"))


def seeded_hash15(key: Column, seed: int) -> Column:
    """First 15 hex chars as a non-negative bigint in [0, 2^60).

    DuckDB mirror (SQL_H15):
    CAST(CONCAT('0x', SUBSTR(MD5(seed || '|' || key), 1, 15)) AS BIGINT)
    """
    return F.conv(F.substring(seeded_md5(key, seed), 1, 15), 16, 10).cast("long")


# str.format-able DuckDB mirrors; keep in sync with the expressions above.
SQL_H15 = "CAST(CONCAT('0x', SUBSTR(MD5({seed} || '|' || {key}), 1, 15)) AS BIGINT)"
SQL_MD5 = "MD5({seed} || '|' || {key})"
