"""Query registry: every implemented operator gets a named (Spark
query, DuckDB oracle SQL) pair — the deterministic correctness contract
(SURVEY.md §2.12).

Conventions that make hash-parity hold (SURVEY §7 hard parts):
  * every query ends in an explicit column list with aliases matching
    the oracle SQL exactly (the driver compares columns by name);
  * floats are computed in Double and rounded once in the final
    projection, with the same expression on the DuckDB side;
  * every ordering used for first/last/top-k has an explicit,
    collision-free tie-break;
  * non-deterministic / engine-specific ops (LSH, engine hash fns)
    register with ``sql=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None => rows-only check
    ids: tuple[str, ...] = ()  # SURVEY §2 operator IDs covered
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, ids=(), sql: str | None = None, bench: bool = False, doc: str = ""):
    """Decorator registering a (spark_fn, oracle_sql) pair."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, sql, tuple(ids), bench, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side effects: modules register themselves
    import dvmax_spark.queries_core  # noqa: F401
    import dvmax_spark.queries_core2  # noqa: F401
    import dvmax_spark.queries_core3  # noqa: F401
    import dvmax_spark.queries_core4  # noqa: F401
    import dvmax_spark.queries_ext  # noqa: F401
    import dvmax_spark.queries_infra  # noqa: F401
    import dvmax_spark.queries_ml  # noqa: F401

    return REGISTRY
