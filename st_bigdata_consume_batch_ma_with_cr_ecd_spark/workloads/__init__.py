"""The query battery behind ``__spark_entry__``.

Importing this package registers every workload module's queries into
``registry.REGISTRY``.
"""

# Registration order is the rotation TIEBREAK (registry.py orders the
# driver's bounded check window by least-recently-checked): the SURVEY
# §2 relational battery and the faithful pipeline first, then
# streaming, the LLM extension surface, and the end-to-end job.
from . import relational, pipeline, streaming, llm, graph_retrieval, consume_e2e  # noqa: F401
from .registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    bench_specs,
    oracle_sql_map,
    queries_map,
)
