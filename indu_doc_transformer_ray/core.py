"""Core pure functions: aspect configuration, tag parsing, GUID recipes.

Semantics mirror the reference engine (cited per function as
``reference:file:line``); the implementation is original.  Everything in this
module is a pure function of strings + config, which is what makes the
distributed pipeline deterministic under parallelism: any worker computing a
GUID or a parsed tag for the same input produces byte-identical output.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass
from typing import Iterable, Optional


# ---------------------------------------------------------------------------
# String normalization (reference: src/indu_doc/common_utils.py:12-24)
# ---------------------------------------------------------------------------

def normalize_string(s: str) -> str:
    """Lowercase, strip, collapse internal whitespace runs to single spaces."""
    return " ".join(s.lower().strip().split())


def is_pin_tag(tag: str) -> bool:
    """A pin designation starts at the first ':' (common_utils.py:26-38)."""
    return ":" in tag


def split_pin_tag(tag_pin: str) -> tuple[str, Optional[str]]:
    """Split ``"+A1-M2:1:2"`` -> ``("+A1-M2", ":1:2")``; pin keeps its ':'
    prefix; no pin -> ``(tag, None)``  (common_utils.py:41-61)."""
    head, sep, rest = tag_pin.partition(":")
    return head, (sep + rest) if sep else None


def strip_pin(tag_: str) -> str:
    """Everything before the first ':' — the Tag constructor's string
    (tag.py:156-176).  NOT stripped of surrounding whitespace."""
    idx = tag_.find(":")
    return tag_[:idx] if idx != -1 else tag_


# ---------------------------------------------------------------------------
# Aspect configuration (reference: src/indu_doc/configs.py)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AspectLevel:
    separator: str
    aspect: str


class AspectConfig:
    """Ordered separator -> aspect-name map; order encodes level priority
    (configs.py:29-190).  Default order ``= + - : / &`` (configs.py:195-203).
    """

    def __init__(self, levels: list[AspectLevel]):
        # dict insertion order IS the priority order; later duplicate
        # separators overwrite earlier ones, like the reference's dict build.
        self._levels: dict[str, AspectLevel] = {lv.separator: lv for lv in levels}

    @classmethod
    def from_pairs(cls, pairs: Iterable[tuple[str, str]]) -> "AspectConfig":
        return cls([AspectLevel(sep, name) for sep, name in pairs])

    @classmethod
    def from_json(cls, json_str: str) -> "AspectConfig":
        items = json.loads(json_str).get("aspects", [])
        return cls([AspectLevel(i["Separator"], i["Aspect"]) for i in items])

    @property
    def separators(self) -> list[str]:
        return list(self._levels.keys())

    @property
    def aspect_names(self) -> list[str]:
        return [lv.aspect for lv in self._levels.values()]

    def aspect_of(self, separator: str) -> str:
        return self._levels[separator].aspect

    def separator_ge(self, others: Iterable[str]) -> list[str]:
        """All separators with priority >= the lowest-priority member of
        ``others`` (configs.py:131-147); all separators when ``others`` empty.
        """
        ours = self.separators
        others = list(others)
        if not others:
            return ours
        lowest = max(ours.index(sep) for sep in others)
        return ours[: lowest + 1]

    def __eq__(self, other: object) -> bool:
        return isinstance(other, AspectConfig) and self._levels == other._levels

    def __repr__(self) -> str:
        return f"AspectConfig({self.separators})"

    def to_records(self) -> list[dict]:
        return [
            {"Separator": lv.separator, "Aspect": lv.aspect}
            for lv in self._levels.values()
        ]


#: Default levels, matching the reference defaults (configs.py:195-203).
DEFAULT_ASPECT_PAIRS = [
    ("=", "Functional"),
    ("+", "Location"),
    ("-", "Product"),
    (":", "Pin"),
    ("/", "Subdivision"),
    ("&", "Document"),
]

default_config = AspectConfig.from_pairs(DEFAULT_ASPECT_PAIRS)


# ---------------------------------------------------------------------------
# Tag parsing (reference: src/indu_doc/tag.py:340-400)
# ---------------------------------------------------------------------------

def compile_separator_pattern(config: AspectConfig) -> re.Pattern:
    """Alternation of escaped separators; regex alternation prefers the
    leftmost alternative, so longer separators (e.g. ``==`` vs ``=``) must be
    listed first by the config author — the reference relies on the same
    property (tag.py:369-373).  Compile once per actor, reuse per batch."""
    return re.compile("|".join(re.escape(s) for s in config.separators))


def try_parse_tag(
    tag_str: str,
    config: AspectConfig,
    pattern: re.Pattern | None = None,
) -> dict[str, tuple[str, ...]] | None:
    """Parse ``"+A1-M2"`` -> ``{'+': ('A1',), '-': ('M2',)}``.

    Returns ``{}`` for an empty/whitespace string, ``None`` when text
    precedes the first separator or no separator matches
    (tag.py:363-400).  Values are stripped; repeated separators accumulate
    tuples in match order.
    """
    tag_str = tag_str.strip()
    if not tag_str:
        return {}
    pat = pattern if pattern is not None else compile_separator_pattern(config)
    matches = list(pat.finditer(tag_str))
    if not matches or matches[0].start() != 0:
        return None
    out: dict[str, list[str]] = {}
    for i, m in enumerate(matches):
        sep = m.group(0)
        start = m.end()
        end = matches[i + 1].start() if i + 1 < len(matches) else len(tag_str)
        out.setdefault(sep, []).append(tag_str[start:end].strip())
    return {sep: tuple(vals) for sep, vals in out.items()}


def tag_parts(
    tag_str: str,
    config: AspectConfig,
    pattern: re.Pattern | None = None,
) -> dict[str, tuple[str, ...]]:
    """``Tag.get_tag_parts`` for a tag without pre-set aspects
    (tag.py:237-257): on a successful parse, cover every separator from the
    highest priority down to the lowest one present (missing levels map to
    ``()``); on a failed parse return ``{}``.

    Note the reference quirk: an *empty* string parses to ``{}`` (not None),
    so the result covers ALL configured separators with empty tuples.
    """
    parsed = try_parse_tag(tag_str, config, pattern)
    if parsed is None:
        return {}
    return {
        sep: parsed.get(sep, ())
        for sep in config.separator_ge(parsed.keys())
    }


def footer_tag_parts(
    footer_tags: Iterable[str],
    config: AspectConfig,
    pattern: re.Pattern | None = None,
) -> dict[str, str]:
    """Fold the footer's tag strings into one separator -> value map
    (tag.py:200-211): unparseable footer tags are skipped, the ``&`` level
    and empty values are ignored, later footer tags overwrite earlier ones,
    and only the first value per separator is taken."""
    out: dict[str, str] = {}
    for foo in footer_tags:
        parsed = try_parse_tag(foo, config, pattern)
        if not parsed:
            continue
        for sep, vals in parsed.items():
            if sep != "&" and vals and vals != ("",):
                out[sep] = vals[0]
    return out


def merge_tag_with_footer(
    tag_str: str,
    footer_tags: Iterable[str],
    config: AspectConfig,
    pattern: re.Pattern | None = None,
    foot: dict[str, str] | None = None,
    parts_memo: dict | None = None,
) -> str:
    """Complete an incomplete page tag from the footer hierarchy
    (tag.py:178-224): walk separators in priority order, stop at the first
    level the page tag itself provides, and prepend footer values for the
    levels above it.  Returns the completed tag string (pin part stripped,
    as the Tag constructor would).  ``foot`` may carry a precomputed
    ``footer_tag_parts`` result and ``parts_memo`` a string->parts cache
    (pure-function cache hooks: the same footer recurs for every tag on a
    page, and the same raw tag recurs across pages/documents)."""
    stripped = strip_pin(tag_str)
    if parts_memo is not None:
        page_parts = parts_memo.get(stripped)
        if page_parts is None:
            page_parts = tag_parts(stripped, config, pattern)
            parts_memo[stripped] = page_parts
    else:
        page_parts = tag_parts(stripped, config, pattern)
    if foot is None:
        foot = footer_tag_parts(footer_tags, config, pattern)
    prefix = ""
    for sep in config.separators:
        if sep in page_parts and page_parts[sep]:
            break
        if sep in foot:
            prefix += f"{sep}{foot[sep]}"
    return strip_pin(prefix + stripped)


def rebuild_tag_display(
    parts: dict[str, tuple[str, ...]], config: AspectConfig
) -> str:
    """Reconstruct a display tag string from parts in configured separator
    order (xtarget.py:119-139)."""
    return "".join(
        "".join(f"{sep}{v}" for v in parts[sep])
        for sep in config.separators
        if sep in parts
    )


# ---------------------------------------------------------------------------
# GUID recipes (md5 -> UUID), byte-compatible with the reference
# ---------------------------------------------------------------------------
# The reference builds several of these strings with `list += str`, which
# appends the string CHARACTER BY CHARACTER before ':'.join(...) — i.e. the
# joined form interleaves ':' between every character.  We reproduce that
# exactly (it is part of the GUID contract), spelled as an explicit
# char-join helper rather than an accident.

def _md5_uuid(s: str) -> str:
    # equals str(uuid.UUID(bytes=md5digest)) — the hyphenated hexdigest —
    # without constructing a UUID object (hot path: every GUID).
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def _charjoin(s: str) -> list[str]:
    """The `list += str` idiom: each character becomes its own ':' element."""
    return list(s)


def _cj(s: str) -> str:
    """``':'.join(_charjoin(s))`` without the intermediate list — interleaves
    ':' between every character (hot path: every connection/link/pin GUID)."""
    return ":".join(s)


def xtarget_guid(tag_str: str) -> str:
    """md5 of the (footer-merged, pin-stripped, UNstripped) tag string
    (xtarget.py:141-154)."""
    return _md5_uuid(tag_str)


def aspect_guid(separator: str, value: str) -> str:
    """md5 of ``f"{separator}{value}"`` (tag.py:61-93)."""
    return _md5_uuid(f"{separator}{value}")


def simple_attr_guid(name: str, value: str) -> str:
    """md5 of ``f"{name}:{value}"`` (attributes.py:252-259)."""
    return _md5_uuid(f"{name}:{value}")


def routing_attr_guid(name: str, tracks: list[str], sep: str = ";") -> str:
    """md5 of name + separator-joined SORTED tracks (attributes.py:373-381)."""
    return _md5_uuid(f"{name}:{sep.join(sorted(tracks))}")


def plc_attr_guid(address: str, meta: dict[str, str]) -> str:
    """md5 of address + ';'-joined sorted ``k=v`` pairs (attributes.py:492-500)."""
    meta_str = ";".join(f"{k}={v}" for k, v in sorted(meta.items()))
    return _md5_uuid(f"{address}:{meta_str}")


def pdf_location_guid(
    name: str, page_no: int, bbox: tuple[float, float, float, float]
) -> str:
    """md5 of ``f"{name}:{page_no}:{bbox}"`` — the bbox rendered via Python
    tuple repr (attributes.py:623-630)."""
    return _md5_uuid(f"{name}:{page_no}:{tuple(bbox)}")


def connection_guid(
    src_guid: Optional[str], dest_guid: Optional[str], through_guid: Optional[str]
) -> str:
    """``CONN:`` + char-joined src/dest/through GUIDs, ``SRC:None`` etc. for
    absent ends (connection.py:359-372).  Spelled as pre-joined chunks —
    ``':'.join(a_chars + b_chars)`` == ``':'.join(a) + ':' + ':'.join(b)``."""
    return _md5_uuid(
        "CONN:"
        + (_cj(src_guid) if src_guid else "SRC:None")
        + ":" + (_cj(dest_guid) if dest_guid else "DEST:None")
        + ":" + (_cj(through_guid) if through_guid else "THROUGH:None")
    )


def link_guid(
    name: str,
    src_pin_name: Optional[str],
    dest_pin_name: Optional[str],
    parent_conn_guid: Optional[str],
) -> str:
    """``LINK:`` + name + char-joined ``SRC:<pin>`` / ``DEST:<pin>`` /
    parent-connection GUID (connection.py:233-247).  Pin names keep their
    leading ':'."""
    return _md5_uuid(
        "LINK:" + name
        + ":" + (_cj("SRC:" + src_pin_name) if src_pin_name else "SRC:None")
        + ":" + (_cj("DEST:" + dest_pin_name) if dest_pin_name else "DEST:None")
        + ":" + (_cj(parent_conn_guid) if parent_conn_guid else "PARENT:None")
    )


def pin_guid(
    name: str,
    role: str,
    child_guid: Optional[str],
    parent_link_guid: Optional[str],
) -> str:
    """``PIN:`` + name + char-joined role + child GUID + parent-link GUID
    (connection.py:93-106)."""
    return _md5_uuid(
        "PIN:" + name
        # an empty role contributed NO list element in the char-join form,
        # hence no ':' either — preserve that byte-for-byte
        + ((":" + _cj(role)) if role else "")
        + ":" + (_cj(child_guid) if child_guid else "CHILD:None")
        + ":" + (_cj(parent_link_guid) if parent_link_guid else "PARENT:None")
    )


def pin_chain_guids(
    pin_tag: str, role: str, parent_link_guid: Optional[str]
) -> list[tuple[str, str]]:
    """Expand ``":PIN1:PIN2"`` into its pin chain as ``[(guid, name), ...]``
    from the head pin down (god.py:398-422): the chain is built over the
    REVERSED name list so the first name is the head whose child is the rest.
    Returns ``[]`` for a tag without pin parts."""
    names = pin_tag.split(":")[1:]
    if not names:
        return []
    chain: list[tuple[str, str]] = []
    child_guid: Optional[str] = None
    for name in reversed(names):
        g = pin_guid(name, role, child_guid, parent_link_guid)
        chain.append((g, name))
        child_guid = g
    chain.reverse()
    return chain


def error_guid(severity: str, message: str) -> str:
    """Engine-side identity for a page error (the reference hashes the
    ``(message, error_type)`` dataclass, common_page_utils.py:20-26; we need
    a stable string key for the edge table)."""
    return _md5_uuid(f"ERR:{severity}:{message}")
