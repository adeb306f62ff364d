"""Role canonicalization (SURVEY.md F11 analogue: the reference's
language-name → ISO-639-1 literal lookup, ``Scopus.py:101-112``,
``WebOfScience.py:135-149``).

Raw feeds emit role variants ("USER", "Assistant", "ai", "human",
"function", …); the canonical vocabulary is
``user | assistant | system | tool``. Implemented as a literal
``CASE``/map expression — pure Catalyst, constant-folded, no join
and no Python.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

ROLE_MAP: dict[str, str] = {
    "user": "user",
    "human": "user",
    "customer": "user",
    "end_user": "user",
    "assistant": "assistant",
    "ai": "assistant",
    "bot": "assistant",
    "model": "assistant",
    "agent": "assistant",
    "system": "system",
    "sys": "system",
    "tool": "tool",
    "function": "tool",
    "tool_result": "tool",
    "observation": "tool",
}


def canonical_role_expr(col: Column | str, default: str | None = None) -> Column:
    """Map a raw role string to the canonical vocabulary.

    Unknown / NULL roles map to ``default`` (NULL by default —
    the engine never invents data; reference leaves unknown
    languages empty, ``Scopus.py:110-112``).
    """
    c = F.col(col) if isinstance(col, str) else col
    lookup = F.create_map(*[F.lit(x) for x in chain.from_iterable(ROLE_MAP.items())])
    out = lookup[F.lower(F.trim(c))]
    return out if default is None else F.coalesce(out, F.lit(default))


def role_case_sql(col: str = "role") -> str:
    """ANSI-SQL CASE with identical semantics (for oracle parity)."""
    whens = "\n".join(
        f"        WHEN '{k}' THEN '{v}'" for k, v in ROLE_MAP.items()
    )
    return f"CASE lower(trim({col}))\n{whens}\n        ELSE NULL END"
