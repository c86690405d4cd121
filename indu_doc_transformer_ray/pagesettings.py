"""JSON page-settings: load / save / round-trip of the extraction config.

Parity surface for the reference's ``PageSettings`` (reference:
src/indu_doc/plugins/eplan_pdfs/page_settings.py:9-113): the same
``TableSetup`` / ``PageSetup`` field vocabulary, ``to_json``/``from_json``
with the list->tuple rect fixup (page_settings.py:78-93), file save/load
where a missing file yields empty settings (page_settings.py:104-113), and
``to_enum`` (page_settings.py:61-62).

On top of that, this module is where the repo's ``PAGE_SPECS`` come from:
``default_page_settings()`` parses the shipped
``default_page_settings.json`` and ``page_specs_from_settings`` lowers the
reference-shaped config into the columnar ``PageSpec`` model the emit stage
consumes — so "add a page type" is a JSON edit (plus an emitter
registration), never a code change to the spec table.  Geometry fields
(``roi``, ``lines``, ``overlap_test_roi``) are carried losslessly for
round-trip with reference-authored settings files, but are unused by the
geometry-free span pipeline (COVERAGE.md M2/M9).
"""

from __future__ import annotations

import json
import logging
from dataclasses import asdict, dataclass, field
from pathlib import Path

from .pagemodel import ColumnSpec, PageSpec, PageType, TableSpec

logger = logging.getLogger(__name__)

Rect = tuple[float, float, float, float]

DEFAULT_SETTINGS_PATH = Path(__file__).parent / "default_page_settings.json"


@dataclass
class TableSetup:
    """One table role's config (reference page_settings.py:9-25); ``columns``
    maps name -> [include] or [include, ffill_placeholder]."""

    key_columns: dict[str, str] = field(default_factory=dict)
    description: str = ""
    roi: Rect = (0, 0, 0, 0)
    text_only: bool = False
    lines: list[tuple[tuple[float, float], tuple[float, float]]] = field(
        default_factory=list
    )
    columns: dict[str, tuple] = field(default_factory=dict)
    overlap_test_roi: Rect | None = None
    expected_num_tables: int = 1
    on_many_join: bool = False
    on_many_no_header: bool = False
    row_offset: int = 0


@dataclass
class PageSetup:
    """One page type's config: table roles + title search name
    (reference page_settings.py:27-31)."""

    tables: dict[str, TableSetup]
    description: str = ""
    search_name: str = ""


def _to_tuple_rect(value):
    if (
        isinstance(value, list)
        and len(value) == 4
        and all(isinstance(v, (int, float)) for v in value)
    ):
        return tuple(value)
    return value


def _fix_table_data(v: dict) -> dict:
    """list->tuple fixups after json.loads (reference page_settings.py:78-93),
    plus the columns tuple encoding."""
    v["roi"] = _to_tuple_rect(v.get("roi", (0, 0, 0, 0)))
    if v.get("overlap_test_roi") is not None:
        v["overlap_test_roi"] = _to_tuple_rect(v["overlap_test_roi"])
    if "lines" in v:
        v["lines"] = [tuple(map(tuple, line)) for line in v["lines"]]
    if "columns" in v:
        v["columns"] = {k: tuple(c) for k, c in v["columns"].items()}
    return v


class PageSettings:
    """File-backed page-settings store.  Keys are ``PageType`` members when
    the JSON key names one, else the raw string (the extension path for page
    types the enum doesn't know yet)."""

    def __init__(
        self,
        filename: str | Path,
        pages_setup: dict[PageType | str, PageSetup] | None = None,
    ):
        self.filename = str(filename)
        if pages_setup:
            self.pages_setup = pages_setup
            self.save()
        else:
            self.load()

    @classmethod
    def init_from_file(cls, filepath: str | Path) -> "PageSettings":
        return PageSettings(filepath)

    def __getitem__(self, key) -> PageSetup:
        return self.pages_setup[key]

    def __setitem__(self, key, value) -> None:
        self.pages_setup[key] = value

    def __contains__(self, key) -> bool:
        return key in self.pages_setup

    def to_enum(self) -> dict[PageType | str, str]:
        """key -> title search name (reference page_settings.py:61-62)."""
        return {k: v.search_name for k, v in self.pages_setup.items()}

    def to_json(self) -> str:
        return json.dumps(
            {
                (k.name if isinstance(k, PageType) else k): asdict(s)
                for k, s in self.pages_setup.items()
            },
            indent=2,
        )

    def from_json(self, json_str: str) -> None:
        settings: dict[PageType | str, PageSetup] = {}
        try:
            data = json.loads(json_str)
        except Exception as e:  # noqa: BLE001 — mirrors the broad catch
            logger.error("Failed to load extraction settings: %s", e)
            self.pages_setup = settings
            return
        for key, value in data.items():
            tables = {
                k: TableSetup(**_fix_table_data(dict(v)))
                for k, v in value["tables"].items()
            }
            try:
                pk: PageType | str = PageType[key]
            except KeyError:
                pk = key  # unknown page type: keep as string key
            settings[pk] = PageSetup(
                tables=tables,
                description=value.get("description", ""),
                search_name=value.get("search_name", ""),
            )
        self.pages_setup = settings

    def save(self) -> None:
        with open(self.filename, "w", encoding="utf-8") as f:
            f.write(self.to_json())

    def load(self) -> None:
        # a+ so a missing file reads as empty settings (page_settings.py:111)
        with open(self.filename, "a+", encoding="utf-8") as f:
            f.seek(0)
            self.from_json(f.read())


# -- lowering into the columnar PageSpec model ------------------------------

def page_spec_from_setup(key: PageType | str, setup: PageSetup) -> PageSpec:
    tables = []
    for role, ts in setup.tables.items():
        cols = []
        for name, enc in ts.columns.items():
            include = bool(enc[0]) if enc else True
            placeholder = enc[1] if len(enc) > 1 else None
            cols.append(ColumnSpec(name, include, placeholder))
        tables.append(TableSpec(role, tuple(cols), text_only=ts.text_only))
    return PageSpec(key, setup.search_name, tuple(tables))


def page_specs_from_settings(
    settings: PageSettings,
) -> dict[PageType | str, PageSpec]:
    return {
        k: page_spec_from_setup(k, s) for k, s in settings.pages_setup.items()
    }


def settings_from_page_specs(
    specs: dict[PageType | str, PageSpec], filename: str | Path
) -> PageSettings:
    """Inverse lowering (used for round-trip tests and for exporting the
    active config back to an editable JSON file)."""
    setup: dict[PageType | str, PageSetup] = {}
    for k, spec in specs.items():
        tables = {}
        for t in spec.tables:
            cols = {}
            for c in t.columns:
                cols[c.name] = (
                    (c.include,)
                    if c.ffill_placeholder is None
                    else (c.include, c.ffill_placeholder)
                )
            tables[t.key] = TableSetup(columns=cols, text_only=t.text_only)
        setup[k] = PageSetup(tables=tables, search_name=spec.search_name)
    return PageSettings(filename, pages_setup=setup)


_default_specs_cache: dict[PageType | str, PageSpec] | None = None


def default_page_settings() -> PageSettings:
    s = PageSettings.__new__(PageSettings)
    s.filename = str(DEFAULT_SETTINGS_PATH)
    s.from_json(DEFAULT_SETTINGS_PATH.read_text(encoding="utf-8"))
    return s


def default_page_specs() -> dict[PageType | str, PageSpec]:
    """The shipped config, parsed once — this IS ``pagemodel.PAGE_SPECS``."""
    global _default_specs_cache
    if _default_specs_cache is None:
        _default_specs_cache = page_specs_from_settings(default_page_settings())
    return _default_specs_cache
