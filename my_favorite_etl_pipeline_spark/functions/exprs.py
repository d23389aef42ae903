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
