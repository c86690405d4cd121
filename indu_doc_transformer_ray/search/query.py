"""Search query DSL: parser + per-document filter evaluation.

Grammar (reference: src/indu_doc/lark_parser.py:45-67):

    query  := TAGWORD? filter*
    TAGWORD:= /([=+-.][A-Za-z0-9_]+)+/        (leading position only)
    filter := "@" dotted_name ("=" value)?
    dotted := WORD ("." WORD)* ("(" param ")")?
    value  := any text up to the next '@', stripped

Implemented as a small recursive-descent scanner (no parser-library
dependency).  One observed reference-transformer behavior is reproduced
deliberately: when a dotted name has more than one component, the LAST
component is treated as the lookup parameter (explicit ``(param)`` and a
final dotted component are indistinguishable after transformation,
lark_parser.py:118-138) — for dict walks the two are equivalent, for list
leaves the param drives the per-item lookup.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Optional

from ..core import normalize_string

_TAGWORD = re.compile(r"([=+\-.][A-Za-z0-9_]+)+")
_WORD = re.compile(r"[^=.\s()@]+")


@dataclass
class Filter:
    path: list[str]
    param: Optional[str]
    value: Optional[str]


class QueryError(ValueError):
    pass


def parse_query(program: str) -> tuple[Optional[str], list[Filter]]:
    """Parse a search program into ``(tag, filters)`` (lark_parser.py:189-199)."""
    s = program
    i = 0
    n = len(s)

    def skip_ws(k: int) -> int:
        while k < n and s[k].isspace():
            k += 1
        return k

    i = skip_ws(i)
    tag: Optional[str] = None
    if i < n and s[i] != "@":
        m = _TAGWORD.match(s, i)
        if not m:
            raise QueryError(f"cannot parse query at offset {i}: {s[i:i+20]!r}")
        tag = m.group(0)
        i = m.end()

    filters: list[Filter] = []
    i = skip_ws(i)
    while i < n:
        if s[i] != "@":
            raise QueryError(f"expected '@' at offset {i}: {s[i:i+20]!r}")
        i += 1
        words: list[str] = []
        m = _WORD.match(s, i)
        if not m:
            raise QueryError(f"expected name after '@' at offset {i}")
        words.append(m.group(0))
        i = m.end()
        while i < n and s[i] == ".":
            m = _WORD.match(s, i + 1)
            if not m:
                raise QueryError(f"expected name after '.' at offset {i}")
            words.append(m.group(0))
            i = m.end()
        param: Optional[str] = None
        if i < n and s[i] == "(":
            close = s.find(")", i + 1)
            if close == -1:
                raise QueryError("unclosed '(' in query")
            inner = s[i + 1 : close]
            if inner:
                param = inner
            i = close + 1
        value: Optional[str] = None
        if i < n and s[i] == "=":
            i += 1
            nxt = s.find("@", i)
            end = nxt if nxt != -1 else n
            value = s[i:end].strip()
            i = end
        # reference transformer folds an explicit param / final dotted
        # component into the SAME slot (lark_parser.py:128-138)
        combined = words + ([param] if param is not None else [])
        if len(combined) == 1:
            path, eff_param = combined, None
        else:
            path, eff_param = combined[:-1], combined[-1]
        filters.append(Filter(path=path, param=eff_param, value=value))
        i = skip_ws(i)
    return tag, filters


def partial_match(text: str, q: str) -> bool:
    """Normalized substring match (searcher.py:147-160)."""
    return normalize_string(q) in normalize_string(text)


def check_path_match(
    data: Any, path: list[str], param: Optional[str], value: Optional[str]
) -> bool:
    """Path walk with list fan-out + param lookup + partial value match
    (searcher.py:211-246)."""
    current = data
    for i, p in enumerate(path):
        p = normalize_string(p)
        if isinstance(current, dict):
            if p not in current:
                return False
            current = current[p]
        elif isinstance(current, list):
            rest = path[i:]
            return any(
                check_path_match(item, rest, param, value) for item in current
            )
        else:
            return False

    if isinstance(current, dict) and param:
        param = normalize_string(param)
        if param in current:
            current = current[param]
        else:
            return False
    elif isinstance(current, list) and param:
        param = normalize_string(param)
        return any(
            isinstance(item, dict)
            and param in item
            and (value is None or partial_match(str(item[param]), value))
            for item in current
        )
    elif param:
        return False

    if value is not None:
        return partial_match(str(current), value)
    return True


def matches(doc: dict, tag: Optional[str], filters: list[Filter],
            tag_field: str = "tag") -> bool:
    """Full per-document predicate (searcher.py:162-209)."""
    if tag and not partial_match(str(doc.get(tag_field, "")), tag):
        return False
    return all(
        check_path_match(doc, f.path, f.param, f.value) for f in filters
    )


def merge_search_tree(tree: dict, data: Any, path=None) -> None:
    """Available-field discovery tree (searcher.py:19-69): nested dict of
    normalized keys; list branches collapse under '[list items]'."""
    if path is None:
        path = []
    if isinstance(data, dict):
        for key, value in data.items():
            nk = normalize_string(str(key))
            merge_search_tree(tree.setdefault(nk, {}), value, path + [nk])
    elif isinstance(data, list):
        branch = tree.setdefault("[list items]", {})
        for item in data:
            merge_search_tree(branch, item, path)
