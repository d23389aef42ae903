"""Query plans — importing this package registers every query."""

from . import (  # noqa: F401
    events_analytics,
    pipeline,
    relational,
    relational_ext,
    relational_ext2,
)

try:  # optional modules land incrementally; keep registration resilient
    from . import llm_ext  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import llm_ext2  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import streaming_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
