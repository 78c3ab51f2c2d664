"""The query battery behind ``__spark_entry__``.

Importing this package registers every workload module's queries into
``registry.REGISTRY``.
"""

# Registration order == driver correctness-check order (the driver
# evaluates a bounded prefix of the registry): the SURVEY §2 relational
# battery and the faithful pipeline come first, then streaming, then
# the LLM extension surface.
from . import relational, pipeline, streaming, llm  # noqa: F401
from .registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    bench_specs,
    oracle_sql_map,
    queries_map,
)
