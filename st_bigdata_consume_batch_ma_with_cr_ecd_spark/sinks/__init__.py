from .writers import (  # noqa: F401
    overwrite_partitions,
    write_csv_gzip,
    write_json_gzip,
)
