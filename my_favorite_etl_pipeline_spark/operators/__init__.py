from . import dq, incremental, merge  # noqa: F401
