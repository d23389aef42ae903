from .tables import TABLE_NAMES, load, load_all, register_temp_views  # noqa: F401
