"""Expression-level utilities.

``let(value, body)`` — bind a column expression to a lambda variable so the
body references ONE evaluation of it. Catalyst does not common-subexpression
-eliminate through higher-order-function lambdas, so an expression used k
times is otherwise evaluated k times (and the duplicated tree can blow up
codegen superlinearly — a 32-hash MinHash signature referenced by 16 band
hashes re-inlines the whole signature 32×). Implemented as
``transform(array(value), x -> body(x))[0]``: the array wraps the value,
the lambda binds it, element 1 unwraps the result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once; make it available to ``body`` as a variable."""
    return F.element_at(F.transform(F.array(value), body), 1)


def surrogate_key(*cols: Column | str, sep: str = "\x1f") -> Column:
    """Deterministic surrogate key from business-key columns.

    md5 of the separator-joined key parts — stable across runs, partitions,
    and engines (unlike ``monotonically_increasing_id``, which encodes the
    partition layout, or row_number over a global window, which serializes
    on one task). NULL parts hash as the empty string; the unit separator
    keeps ("a","bc") distinct from ("ab","c").
    """
    parts = [F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("")) for c in cols]
    return F.md5(F.concat_ws(sep, *parts))
