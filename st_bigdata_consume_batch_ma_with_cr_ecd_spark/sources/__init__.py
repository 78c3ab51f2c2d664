from .readers import (  # noqa: F401
    read_csv_lookup,
    read_parquet,
    read_table_pruned,
    read_testdata,
)
from .sql_templates import load_sql_template, render_sql  # noqa: F401
