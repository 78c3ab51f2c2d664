"""Templated SQL loading (SURVEY.md §2.1 S6 / §2.9 X10).

The reference keeps its 4 pipeline queries as ``.sql`` files with
``str.format`` placeholders (reference ``script/helper.py:64-72``).
We reproduce that as a tiny, safe loader: literal braces in SQL text
(e.g. map literals) must be escaped by the template author as ``{{``.
"""

from __future__ import annotations

import re
from pathlib import Path

# negative lookaround keeps the documented ``{{``/``}}`` escapes from
# reading as placeholders: in "'{{tag}}'" the inner {tag} is preceded
# by '{' and followed by '}', so it is a literal, not a parameter
_PLACEHOLDER = re.compile(r"(?<!\{)\{([A-Za-z_][A-Za-z0-9_]*)\}(?!\})")


def render_sql(template: str, **params: object) -> str:
    """Substitute ``{name}`` placeholders; raise on unknown/missing names."""
    needed = set(_PLACEHOLDER.findall(template))
    missing = needed - params.keys()
    if missing:
        raise KeyError(f"missing SQL template parameters: {sorted(missing)}")
    return template.format(**params)


def load_sql_template(path: str | Path, **params: object) -> str:
    return render_sql(Path(path).read_text(), **params)


def run_templated_query(
    spark,
    template: str,
    *,
    views: dict[str, "object"] | None = None,
    **params: object,
):
    """Execute a rendered SQL template the way the reference's driver
    does (``helper.py:64-72`` + ``main.py``'s ``spark.sql`` loop):
    register each DataFrame in ``views`` as a temp view, substitute the
    ``{name}`` parameters, and hand the text to Catalyst.

    SQL text and the DataFrame API compile to the same logical plans —
    pushdown/broadcast/AQE behave identically — so pipelines can mix
    both freely (the reference is SQL-first; this engine is
    DataFrame-first with this as the compatibility path).
    """
    for name, df in (views or {}).items():
        df.createOrReplaceTempView(name)
    return spark.sql(render_sql(template, **params))
