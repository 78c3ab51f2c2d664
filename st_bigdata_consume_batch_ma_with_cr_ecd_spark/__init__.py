"""PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference batch ETL job
(`axel-springer-kugawana/ST_bigdata_consume_batch_ma_with_cr_ecd`) as an
idiomatic, 100-TB-scalable PySpark library:

- ``session``    — SparkSession factory (local test defaults, cluster-safe confs)
- ``sources``    — parquet / catalog / CSV / templated-SQL readers
- ``sinks``      — gzip JSON / gzip CSV / dynamic-partition-overwrite writers
- ``operators``  — reusable relational operators (top-1-per-group dedup,
                   as-of backfill join, null-aware NOT IN anti join,
                   broadcast lookup join, union helpers, pre-agg joins)
- ``functions``  — column machinery (nest/flatten, when-chains, prefix
                   selection, bulk rename, map construction) and text ops
- ``pipeline``   — the reference's 4-stage market-analytics pipeline,
                   re-expressed over fixture-shaped DataFrames
- ``streaming``  — Structured Streaming equivalents (windowed aggs, dedup)
- ``workloads``  — the query battery wired into ``__spark_entry__``:
                   each entry pairs a Spark callable with a DuckDB oracle
"""

__version__ = "0.1.0"
