"""Flat <-> nested schema duality (SURVEY.md §2.3, P7).

The reference stores everything under a flattened ``a_b_c`` column
namespace and re-nests it into ``struct a { struct b { c } }`` only for
the JSON sink (reference ``script/helper.py:19-51,174-175``). We provide
the pair as first-class, round-trippable operators:

    nest_columns(flatten_structs(df)) == df      (names + values)

Both are pure projections — zero shuffle, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def nest_columns(df: DataFrame, sep: str = "_", *, only_prefixes: list[str] | None = None) -> DataFrame:
    """Split column names on ``sep`` and rebuild the struct tree.

    A name without ``sep`` stays a top-level scalar. Name conflicts
    (``a`` scalar + ``a_b``) raise — same constraint the reference's
    schema implicitly satisfies.
    """
    tree: dict = {}
    for name in df.columns:
        if only_prefixes is not None and not any(name.startswith(p + sep) or name == p for p in only_prefixes):
            tree[name] = name  # passthrough untouched
            continue
        parts = name.split(sep)
        node = tree
        for p in parts[:-1]:
            nxt = node.get(p)
            if isinstance(nxt, str):
                raise ValueError(f"column {name!r} conflicts with scalar {nxt!r}")
            if nxt is None:
                nxt = node[p] = {}
            node = nxt
        if isinstance(node.get(parts[-1]), dict):
            raise ValueError(f"scalar {name!r} conflicts with struct prefix")
        node[parts[-1]] = name

    def build(node: dict | str) -> Column:
        if isinstance(node, str):
            return F.col(f"`{node}`")
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    return df.select(*[build(v).alias(k) for k, v in tree.items()])


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Inverse of :func:`nest_columns`: explode every StructType column
    into ``parent<sep>child`` scalars, recursively. Arrays/maps are kept
    opaque (their elements keep internal structure)."""
    cols: list[Column] = []

    def walk(path: list[str], dtype: T.DataType) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(path + [f.name], f.dataType)
        else:
            cols.append(F.col(".".join(f"`{p}`" for p in path)).alias(sep.join(path)))

    for f in df.schema.fields:
        walk([f.name], f.dataType)
    return df.select(*cols)
