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

from dataclasses import dataclass
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


# The page-type configuration is DATA: it lives in
# ``default_page_settings.json`` (reference-shaped, see
# ``extraction_settings.json`` in the reference repo) and is parsed once at
# import by ``pagesettings.default_page_specs`` — adding or editing a page
# type is a JSON edit.  Keys are PageType members for known names, plain
# strings for JSON-introduced extensions.
from .pagesettings import default_page_specs  # noqa: E402  (needs classes above)

PAGE_SPECS: dict = default_page_specs()


def search_name_index() -> dict[str, PageType]:
    """Normalized title text -> page type, for the layout classifier
    (common_page_utils.py:47-70: match is strip+casefold equality)."""
    return {
        spec.search_name.strip().lower(): pt for pt, spec in PAGE_SPECS.items()
    }


#: Footer grid slots whose non-empty values become hierarchy tags, in pick
#: order (footers_extractor.py:203-206: [0][0], [2][0], [0][1], [2][1], [0][2]).
FOOTER_TAG_SLOTS = ("0:0", "2:0", "0:1", "2:1", "0:2")
