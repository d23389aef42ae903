"""my_favorite_etl_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of
aungzawhtet-dev/My-Favorite-ETL-Pipeline (see SURVEY.md), rebuilt Spark-first:
declarative DataFrame plans, Catalyst/AQE physical planning, zero
row-at-a-time Python UDFs on the hot path.
"""

from .registry import REGISTRY, oracle_sql, queries, register  # noqa: F401
from .session import get_spark, tune_session  # noqa: F401
from . import plans  # noqa: F401  — registers all queries

__all__ = ["REGISTRY", "queries", "oracle_sql", "register", "get_spark", "tune_session"]
