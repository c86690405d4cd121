"""Span-document model: parsing the interleaved span encoding into pages.

The engine's input is the BASELINE input_hint table
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
Span kinds encode what the reference reads off a PDF page (FIXTURES.md §2):

    page_break   start of a new page (page_no = count of preceding breaks)
    title        the 20-30pt page-title span used by the layout classifier
    footer_cell  one footer cell; text = "<slot>\\x1f<value>",
                 slot in {"project", "product", "<row>:<col>"}
    cell         one table cell; text = "<table_key>\\x1f<row>\\x1f<col>\\x1f<value>"
    char_run     a RAW positioned character run on a table row (the shape the
                 reference reads via get_text("rawdict") chars,
                 table_extractor.py:37-68); text =
                 "<table_key>\\x1f<row>\\x1f<codepoint>:<x0>:<x1>;..." —
                 resolved into cells by the overlap split/repair pass in
                 tables.py (synthetic x geometry: column k spans
                 [k*100, (k+1)*100))
    text         a text-only ROI; text = "<table_key>\\x1f<value>"
    media        opaque media payload reference (passed through, order kept)

This module is pure Python over one document's spans — no Ray, no pandas —
so it is shared verbatim by the distributed stages and the single-process
oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from operator import itemgetter
from typing import NamedTuple, Optional

US = "\x1f"  # unit separator used by the fixture encoding


class Span(NamedTuple):
    kind: str
    text: str
    media_ref: str
    offset: int


@dataclass
class PageSpans:
    """One page's worth of raw spans, bucketed by role."""

    page_no: int  # 0-based, like pymupdf.Page.number
    title: Optional[str] = None  # first title span's text wins
    footer_cells: dict[str, str] = field(default_factory=dict)  # slot -> text
    # table_key -> {(row, col) -> value}; first span per cell wins
    cells: dict[str, dict[tuple[int, int], str]] = field(default_factory=dict)
    texts: dict[str, str] = field(default_factory=dict)  # text-only ROIs
    # table_key -> [(row, [(char, x0, x1), ...])] raw char runs, span order
    char_runs: dict[str, list[tuple[int, list[tuple[str, float, float]]]]] = (
        field(default_factory=dict)
    )
    spans: list[Span] = field(default_factory=list)  # all raw spans, in order


@dataclass
class PageFooter:
    """Extracted footer (reference: src/indu_doc/footers.py:16-53)."""

    project_name: str
    product_name: str
    tags: list[str]


def split_pages(spans: list[Span]) -> list[PageSpans]:
    """Bucket a document's offset-ordered spans into pages.

    Mirrors the reference's page iteration (eplan_pdf_plugin.py:48-64):
    page boundaries are ``page_break`` spans; content before the first break
    belongs to page 0 (a document that starts without a break still has one
    page).
    """
    pages: list[PageSpans] = []
    cur = PageSpans(page_no=0)
    started = False  # becomes True at first page_break or first content span

    def flush():
        nonlocal cur
        pages.append(cur)
        cur = PageSpans(page_no=len(pages))

    # itemgetter(3) == .offset but stays in C — this sort touches every span
    # of the corpus, and the input is usually already offset-ordered
    for sp in sorted(spans, key=itemgetter(3)):
        if sp.kind == "page_break":
            if started:
                flush()
            started = True
            cur.spans.append(sp)
            continue
        started = True
        cur.spans.append(sp)
        if sp.kind == "title":
            if cur.title is None:
                cur.title = sp.text
        elif sp.kind == "footer_cell":
            slot, _, value = sp.text.partition(US)
            cur.footer_cells.setdefault(slot, value)
        elif sp.kind == "cell":
            parts = sp.text.split(US, 3)
            if len(parts) == 4:
                key, row_s, col_s, value = parts
                try:
                    rc = (int(row_s), int(col_s))
                except ValueError:
                    continue
                cur.cells.setdefault(key, {}).setdefault(rc, value)
        elif sp.kind == "char_run":
            parts = sp.text.split(US, 2)
            if len(parts) == 3:
                key, row_s, charspec = parts
                try:
                    row = int(row_s)
                    chars = []
                    for item in charspec.split(";"):
                        if not item:
                            continue
                        cp, x0, x1 = item.split(":")
                        chars.append((chr(int(cp)), float(x0), float(x1)))
                except ValueError:
                    continue
                cur.char_runs.setdefault(key, []).append((row, chars))
        elif sp.kind == "text":
            key, _, value = sp.text.partition(US)
            cur.texts.setdefault(key, value)
        # media and unknown kinds: carried in cur.spans only

    if cur.spans:
        pages.append(cur)
    return pages


# Footer hierarchy slots in reference pick order (footers_extractor.py:203-206)
from .pagemodel import FOOTER_TAG_SLOTS  # noqa: E402


def extract_footer(page: PageSpans) -> Optional[PageFooter]:
    """Footer assembly (footers_extractor.py:137-212): a missing/empty
    project name means "no footer" and the page is dropped; hierarchy tags
    are the non-empty values of the five picked grid slots, in pick order."""
    project = page.footer_cells.get("project", "").strip()
    if not project:
        return None
    product = page.footer_cells.get("product", "").strip()
    tags = [
        page.footer_cells[slot].strip()
        for slot in FOOTER_TAG_SLOTS
        if page.footer_cells.get(slot, "").strip()
    ]
    return PageFooter(project_name=project, product_name=product, tags=tags)


def detect_page_type(page: PageSpans, name_index: dict[str, "object"]):
    """Layout classification (common_page_utils.py:47-70): the title span's
    text, stripped and lowercased, must equal a configured search name."""
    if page.title is None:
        return None
    return name_index.get(page.title.strip().lower())
