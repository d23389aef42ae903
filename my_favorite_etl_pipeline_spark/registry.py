"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers one named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, the
equivalent ANSI SQL that DuckDB runs on the same parquet tables. The driver
compares both sides (row count + schema + order-insensitive value hash), so:

- alias every computed column identically on both sides;
- round floating aggregates to a fixed number of decimals on BOTH sides
  (summation order differs between engines; see ``fdec`` helpers in plans);
- cast count-like integer aggregates to BIGINT on the DuckDB side (DuckDB
  widens SUM(int) to HUGEINT, Spark keeps BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}
