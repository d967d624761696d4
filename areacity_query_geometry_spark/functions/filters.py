"""Scalar helpers mirroring the reference's filter surface (SURVEY.md §2.4)."""
from __future__ import annotations

import re


def ext_path_where(pattern: str, col: str = "ext_path") -> str:
    """Compile the reference's `*`-wildcard ext_path match into a SQL
    predicate (F6 — /root/reference/Test.java:842-857,
    Test_HttpApiServer.java:161-177):

        "*洪山*"  → contains       "洪山*" → prefix
        "*洪山"   → suffix          "洪山"  → exact
    """
    esc = pattern.replace("'", "''")
    has_pre = esc.startswith("*")
    has_suf = esc.endswith("*")
    body = esc.strip("*")
    body_like = body.replace("%", r"\%").replace("_", r"\_")
    if has_pre and has_suf:
        return f"{col} LIKE '%{body_like}%'"
    if has_suf:
        return f"{col} LIKE '{body_like}%'"
    if has_pre:
        return f"{col} LIKE '%{body_like}'"
    return f"{col} = '{esc}'"


def deep_where(deep: int) -> str:
    """F5 analog — the reference extracts deep with a regex tolerant of
    string/number JSON encodings (AreaCityQuery.java:165); our
    boundaries schema types it, so this is a plain typed predicate."""
    return f"deep = {int(deep)}"


_ID_RE = re.compile(r"^[0-9]+$")


def id_where(value: str, col: str = "id") -> str:
    """HTTP-api style id/pid match (Test_HttpApiServer.java:187-211)."""
    if not _ID_RE.match(value):
        raise ValueError(f"id filter must be numeric, got {value!r}")
    return f"{col} = '{value}'"
