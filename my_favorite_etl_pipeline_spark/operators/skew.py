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


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Output columns == ``large.join(small, on, how)`` (salt is internal).
    ``rand`` salting is allowed here because it never changes results, only
    placement — any salt value joins the same rows.
    """
    if salt < 2:
        return large.join(small, on, how)
    salted_large = large.withColumn(SALT_COL, (F.rand(seed=0) * salt).cast("int"))
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_large.join(replicated_small, [on, SALT_COL], how).drop(SALT_COL)
