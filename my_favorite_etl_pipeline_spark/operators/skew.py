"""Skew mitigation for hot join keys (100 TB posture, SURVEY §2.8/§4.2).

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. ``salted_join`` is the
explicit fallback for the case AQE can't fix: a single join KEY so hot that
one task would still process it alone (AQE splits partitions, not keys, on
the aggregate side of joins it can't replan).

Mechanics: the skewed (large) side gets a random salt in [0, salt); the
small side is exploded ×salt so every (key, salt) bucket can match. The hot
key's rows spread over ``salt`` tasks at the cost of replicating the small
side ``salt``× — the classic trade, worth it when one key holds >1/salt of
the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


# Join types whose results survive small-side replication: every output row
# is driven by a large-side row, so an unmatched small-side row (which exists
# `salt` times after explode) can never surface. right/full-outer would emit
# each unmatched small row once PER SALT VALUE — silently duplicated nulls —
# so they are rejected.
_SALT_SAFE_HOW = frozenset(
    {"inner", "cross", "left", "leftouter", "left_outer", "semi", "leftsemi", "left_semi",
     "anti", "leftanti", "left_anti"}
)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Output == ``large.join(small, on, how)`` (salt is internal) for every
    large-side-driven join type; ``how`` is restricted to those
    (inner/left/left_semi/left_anti/cross) because right/full-outer would
    return each unmatched small-side row once per replica. ``rand`` salting
    is allowed here because it never changes results, only placement — any
    salt value joins the same rows.
    """
    if how.replace("_", "").lower() not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            f"rows would be duplicated once per salt replica. Use inner/left/"
            f"left_semi/left_anti, or a plain join with AQE skew handling."
        )
    if salt < 2:
        return large.join(small, on, how)
    salted_large = large.withColumn(SALT_COL, (F.rand(seed=0) * salt).cast("int"))
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_large.join(replicated_small, [on, SALT_COL], how).drop(SALT_COL)
