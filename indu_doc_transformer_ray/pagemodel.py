"""Page-type model and per-page-type table setups.

Mirrors the reference's page vocabulary (reference:
src/indu_doc/plugins/eplan_pdfs/common_page_utils.py:30-44) and the shipped
``page_settings.json`` table configuration (the variant the code path
actually reads — it uses the ``strip_tag`` table key, see reference
table_extractor.py:342; SURVEY.md §7.5).  The configuration is data, not
code: new page types are new entries here (the reference's config-driven
extensibility surface).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional


class Severity(str, Enum):
    """Page-error severities (common_page_utils.py:13-17)."""

    INFO = "INFO"
    WARNING = "WARNING"
    FAULT = "FAULT"
    UNKNOWN_ERROR = "UNKNOWN_ERROR"


class PageType(str, Enum):
    """Supported page types; values are internal names, search names live in
    the table setup (common_page_utils.py:30-44)."""

    CONNECTION_LIST = "CONNECTION_LIST"
    DEVICE_TAG_LIST = "DEVICE_TAG_LIST"
    CABLE_OVERVIEW = "CABLE_OVERVIEW"
    CABLE_DIAGRAM = "CABLE_DIAGRAM"
    TOPOLOGY = "TOPOLOGY"
    TERMINAL_DIAGRAM = "TERMINAL_DIAGRAM"
    WIRES_PART_LIST = "WIRES_PART_LIST"
    STRUCTURE_IDENTIFIER_OVERVIEW = "STRUCTURE_IDENTIFIER_OVERVIEW"
    PLC_DIAGRAM = "PLC_DIAGRAM"


@dataclass(frozen=True)
class ColumnSpec:
    """One table column: ``include=False`` drops it after extraction;
    ``ffill_placeholder`` (when not None) is replaced by the previous row's
    value (page_settings.py:18 tuple encoding; table_extractor.py:505-517)."""

    name: str
    include: bool = True
    ffill_placeholder: Optional[str] = None


@dataclass(frozen=True)
class TableSpec:
    """Setup of one table role on a page (page_settings.py:9-25)."""

    key: str
    columns: tuple[ColumnSpec, ...] = ()
    text_only: bool = False

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]


@dataclass(frozen=True)
class PageSpec:
    """Setup of one page type: its title search name + table roles
    (page_settings.py:27-32)."""

    page_type: PageType
    search_name: str
    tables: tuple[TableSpec, ...] = ()

    def table(self, key: str) -> TableSpec:
        for t in self.tables:
            if t.key == key:
                return t
        raise KeyError(key)


def _cols(*specs) -> tuple[ColumnSpec, ...]:
    out = []
    for s in specs:
        if isinstance(s, str):
            out.append(ColumnSpec(s))
        else:
            out.append(ColumnSpec(*s))
    return tuple(out)


# Column lists follow the shipped page_settings.json (roles/keys per page
# type; include flags; ffill placeholders).  ("name", False) = ignored
# column; ("name", True, "=") = forward-fill '=' placeholders.
PAGE_SPECS: dict[PageType, PageSpec] = {
    PageType.CONNECTION_LIST: PageSpec(
        PageType.CONNECTION_LIST,
        "Connection list",
        (
            TableSpec(
                "main",
                _cols("name", "src_pin_tag", "dst_pin_tag", "Color", "Cross-section"),
            ),
        ),
    ),
    PageType.DEVICE_TAG_LIST: PageSpec(
        PageType.DEVICE_TAG_LIST,
        "device tag list",
        (
            TableSpec(
                "main",
                _cols(
                    "tag", "Quantity", "Designation", "Type number",
                    "Manufacturer", "Part number",
                ),
            ),
        ),
    ),
    PageType.CABLE_OVERVIEW: PageSpec(
        PageType.CABLE_OVERVIEW,
        "Cable overview",
        (
            TableSpec(
                "main",
                _cols(
                    ("cable_tag", True, ""),
                    ("Col1", False),
                    "src_tag", "dst_tag", "Cable type", "Conductors",
                    "Cross-section", "Length", "Function text",
                ),
            ),
        ),
    ),
    PageType.CABLE_DIAGRAM: PageSpec(
        PageType.CABLE_DIAGRAM,
        "Cable diagram",
        (
            TableSpec(
                "main",
                _cols(
                    ("Function text Src", True, "="),
                    "Page / Column Src", "src_tag", "src_pin", "Conductor",
                    "dst_tag", "dst_pin", "Page / Column Dst",
                    ("Function text Dst", True, "="),
                ),
            ),
        ),
    ),
    PageType.TOPOLOGY: PageSpec(
        PageType.TOPOLOGY,
        "Topology: Routed cables / connections",
        (
            TableSpec(
                "main",
                _cols(
                    "designation", "Part number", "Type number", "Length [m]",
                    "src_tags", "Source connection length [m]", "route",
                    "dst_tags", "Target connection length [m]",
                ),
            ),
        ),
    ),
    PageType.WIRES_PART_LIST: PageSpec(
        PageType.WIRES_PART_LIST,
        "Wires parts list",
        (
            TableSpec(
                "main",
                _cols(
                    "src_pin_tag", "dst_pin_tag", "Part number",
                    "Cross-section", "Color", "Length", "Bundle",
                    "Bundle groups", "Conductor end source",
                    "Conductor end target", "Routing direction source",
                    "Routing direction target", "route",
                ),
            ),
        ),
    ),
    PageType.STRUCTURE_IDENTIFIER_OVERVIEW: PageSpec(
        PageType.STRUCTURE_IDENTIFIER_OVERVIEW,
        "Structure identifier overview",
        (
            TableSpec(
                "main",
                _cols("tag", ("Ignored2", False), "Structure description"),
            ),
        ),
    ),
    PageType.PLC_DIAGRAM: PageSpec(
        PageType.PLC_DIAGRAM,
        "PLC diagram",
        (
            TableSpec(
                "main",
                _cols(
                    ("tag", True, ""),
                    "plc_addr", "Placement", ("Function text", True, "="),
                    "Rack", "Module", "Symbolic address", "Terminal",
                ),
            ),
        ),
    ),
    PageType.TERMINAL_DIAGRAM: PageSpec(
        PageType.TERMINAL_DIAGRAM,
        "Terminal diagram",
        (
            TableSpec(
                "l_cables",
                _cols(("Ignored1", False), "cable_tag", ("Ignored3", False)),
            ),
            TableSpec(
                "l_conn",
                _cols(
                    ("Function text", True, "="),
                    "1", "2", "3", "4", "5", "6", "7", "8", "9", "10", "11",
                ),
            ),
            TableSpec(
                "r_cables",
                _cols(("Ignored1", False), "cable_tag", ("Ignored2", False)),
            ),
            TableSpec(
                "r_conn",
                _cols(
                    "11", "10", "9", "8", "7", "6", "5", "4", "3", "2", "1",
                    "Page / column",
                ),
            ),
            TableSpec("strip_tag", (), text_only=True),
            TableSpec(
                "main",
                _cols(
                    "src_tag", "src_pin", "strip_pin", "Jumpers",
                    "PLC connection point", "dst_tag", "dst_pin",
                ),
            ),
        ),
    ),
}


def search_name_index() -> dict[str, PageType]:
    """Normalized title text -> page type, for the layout classifier
    (common_page_utils.py:47-70: match is strip+casefold equality)."""
    return {
        spec.search_name.strip().lower(): pt for pt, spec in PAGE_SPECS.items()
    }


#: Footer grid slots whose non-empty values become hierarchy tags, in pick
#: order (footers_extractor.py:203-206: [0][0], [2][0], [0][1], [2][1], [0][2]).
FOOTER_TAG_SLOTS = ("0:0", "2:0", "0:1", "2:1", "0:2")
