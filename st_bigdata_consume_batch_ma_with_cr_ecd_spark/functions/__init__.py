from .columns import (  # noqa: F401
    add_literal_columns,
    bulk_rename,
    drop_columns,
    prefix_select,
    strip_prefix,
)
from .maps import keyed_map_column  # noqa: F401
from .nesting import flatten_structs, nest_columns  # noqa: F401
from .whenchain import when_chain  # noqa: F401
