"""The query battery behind ``__spark_entry__``.

Importing this package registers every workload module's queries into
``registry.REGISTRY``.
"""

from . import llm, pipeline, relational, streaming  # noqa: F401
from .registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    bench_specs,
    oracle_sql_map,
    queries_map,
)
