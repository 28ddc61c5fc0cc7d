"""Query registry: every engine capability registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) plus, when expressible,
the equivalent DuckDB SQL oracle. The driver hash-checks each pair.

Naming discipline: every computed column is aliased identically in
the Spark code and the oracle SQL (the driver sorts columns by name
before hashing). Floating-point outputs are rounded explicitly in
BOTH engines so sums/averages hash identically despite summation
order differing across engines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


def load_all_query_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from maston_spark.queries import relational, validated_q, llm_q, complex  # noqa: F401


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all_query_modules()
    return {n: q.fn for n, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    load_all_query_modules()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}
