"""Registry pairing each Spark query with its DuckDB oracle.

One source of truth consumed by three surfaces:

- ``__spark_entry__.queries()`` / ``oracle_sql()`` (the driver gate)
- ``bench.py`` (specs tagged ``bench``)
- ``tools/check_correctness.py`` (local Spark-vs-DuckDB harness)

Determinism contract for every registered query (SURVEY.md §4):
results must be a *set* of rows reproducible bit-for-bit — so every
window uses a total order (unique tiebreak) and every float aggregate
is rounded identically on both sides (accumulation-order noise in
double sums would otherwise break the driver's value hash).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def bench_specs() -> list[QuerySpec]:
    return [s for s in REGISTRY.values() if "bench" in s.tags]
