"""Table reconstruction + mechanics tests (mirroring the reference's
tests/test_table_extractor.py coverage)."""

import pandas as pd
import pytest

from indu_doc_transformer_ray.pagemodel import PAGE_SPECS, PageType
from indu_doc_transformer_ray.spandoc import PageSpans
from indu_doc_transformer_ray.tables import (
    PageExtractionError,
    RowTable,
    build_table,
    demote_header,
    detect_overlaps,
    extract_page_table,
    promote_header,
    repair_overlaps_by_center,
    shape_cable_diagram,
)


def page_with_cells(key: str, rows: list[list]) -> PageSpans:
    p = PageSpans(page_no=0)
    cells = {}
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is not None:
                cells[(r, c)] = v
    p.cells[key] = cells
    return p


CONN_SPEC = PAGE_SPECS[PageType.CONNECTION_LIST].table("main")


def test_build_table_basic():
    page = page_with_cells(
        "main",
        [
            ["w1", "=A:1", "=B:2", "BK", "1.5"],
            ["w2", "=C:1", "=D:2", "BU", "0.5"],
        ],
    )
    t = build_table(page, CONN_SPEC)
    assert t.columns == [
        "name", "src_pin_tag", "dst_pin_tag", "Color", "Cross-section", "_loc",
    ]
    assert t.rows[0]["src_pin_tag"] == "=A:1"
    assert t.rows[1]["_loc"] == (0.0, 10.0, 1000.0, 20.0)


def test_build_table_missing_table():
    with pytest.raises(PageExtractionError, match="No required table"):
        build_table(PageSpans(page_no=0), CONN_SPEC)


def test_build_table_column_mismatch():
    page = page_with_cells("main", [["a", "b"]])
    with pytest.raises(PageExtractionError, match="Expected 5 columns, found 2"):
        build_table(page, CONN_SPEC)


def test_build_table_drops_empty_rows_preserving_labels():
    page = page_with_cells(
        "main",
        [
            ["w1", "=A:1", "=B:2", "BK", "1.5"],
            ["", "", "", "", ""],
            ["w3", "=E:1", "=F:2", "GN", "1.5"],
        ],
    )
    t = build_table(page, CONN_SPEC)
    assert t.labels == [0, 2]  # labels preserved through the filter
    assert t.rows[1]["_loc"] == (0.0, 20.0, 1000.0, 30.0)


def test_ffill_and_ignored_columns():
    spec = PAGE_SPECS[PageType.CABLE_OVERVIEW].table("main")
    page = page_with_cells(
        "main",
        [
            ["=W1", "ig", "=A", "=B", "t", "4", "1.5", "3m", "f"],
            ["", "ig", "=C", "=D", "t", "4", "1.5", "3m", "f"],
            ["=W2", "ig", "=E", "=F", "t", "4", "1.5", "3m", "f"],
        ],
    )
    t = build_table(page, spec)
    assert "Col1" not in t.columns  # ignored column dropped
    assert [r["cable_tag"] for r in t.rows] == ["=W1", "=W1", "=W2"]


def test_promote_demote_header():
    df = pd.DataFrame([["a", "b"], ["c", "d"]], columns=["X", "Y"])
    d = demote_header(df)
    assert d.shape == (3, 2)
    assert d.iloc[0].tolist() == ["X", "Y"]
    p = promote_header(d, 1)
    assert list(p.columns) == ["X", "Y"]
    assert p.iloc[0].tolist() == ["a", "b"]


def test_cable_diagram_block_split():
    cols = [f"c{i}" for i in range(9)]
    raw = [
        ["Cable unit: =F1-W1", None, None, "", "", "", "", "", ""],
        ["Type LIYY", None, None, "", "", "", "", "", ""],
        cols,  # repeated header row
        ["f1", "1/1", "=A", "1", "BK", "=B", "2", "1/2", "g1"],
        ["f2", "1/1", "=C", "3", "BU", "=D", "4", "1/2", "g2"],
        ["Cable unit: =F1-W2", None, None, "", "", "", "", "", ""],
        ["Type H05VV", None, None, "", "", "", "", "", ""],
        cols,
        ["f3", "1/1", "=E", "5", "GN", "=F", "6", "1/2", "g3"],
    ]
    t = RowTable(
        cols,
        list(range(len(raw))),
        [dict(zip(cols, r)) for r in raw],
    )
    out = shape_cable_diagram({"main": t})
    assert [r["cable_tag"] for r in out.rows] == ["=F1-W1", "=F1-W1", "=F1-W2"]
    assert [r["c2"] for r in out.rows] == ["=A", "=C", "=E"]


def test_extract_page_table_error_envelope():
    page = PageSpans(page_no=0)
    df, errs = extract_page_table(page, PAGE_SPECS[PageType.CONNECTION_LIST])
    assert df is None
    assert errs[0][0].value == "FAULT"
    assert "No required table" in errs[0][1]


def test_overlap_detection_and_repair():
    blocks = [
        (0.0, 0.0, 10.0, 10.0, "a"),
        (5.0, 5.0, 15.0, 15.0, "b"),  # overlaps with "a"
        (100.0, 100.0, 110.0, 110.0, "c"),
    ]
    overlaps = detect_overlaps(blocks)
    assert len(overlaps) == 1
    assert overlaps[0][:2] == ("a", "b")

    row_rects = [(0.0, 0.0, 200.0, 20.0)]
    cell_rects = [[(0.0, 0.0, 8.0, 20.0), (8.0, 0.0, 200.0, 20.0)]]
    fixes = repair_overlaps_by_center(row_rects, cell_rects, overlaps)
    assert fixes == [(0, (0, "a"), (1, "b"))]


def test_split_char_run_overlap_dump():
    """M4: the reference extract_spans char walk — an overlapping char dumps
    the accumulated text as its own block (test_table_extractor.py:77-88)."""
    from indu_doc_transformer_ray.tables import split_char_run

    # plain run: chars concatenate into one block
    chars = [("a", 0.0, 5.0), ("b", 6.0, 10.0)]
    blocks = split_char_run(chars, 0.0, 10.0)
    assert blocks == [(0.0, 0.0, 10.0, 10.0, "ab")]

    # overlap: "cd" starts left of b's right edge -> "ab" dumps first
    chars = [("a", 0.0, 5.0), ("b", 6.0, 10.0), ("c", 3.0, 12.0), ("d", 12.0, 15.0)]
    blocks = split_char_run(chars, 0.0, 10.0)
    assert blocks == [
        (0.0, 0.0, 10.0, 10.0, "ab"),
        (3.0, 0.0, 15.0, 10.0, "cd"),
    ]


def test_char_overlap_repair_end_to_end():
    """M4+M5 wired: a page with colliding char runs repairs into the right
    cells, overwriting tabled values with the reference's INFO records."""
    from indu_doc_transformer_ray.spandoc import US, Span, split_pages

    spans = [
        Span("page_break", "", "", 0),
        Span("cell", f"main{US}0{US}0{US}w1", "", 1),
        Span("cell", f"main{US}0{US}1{US}=A:1", "", 2),
        Span("cell", f"main{US}0{US}2{US}=B:2", "", 3),
        Span("cell", f"main{US}0{US}3{US}??", "", 4),
        Span("cell", f"main{US}0{US}4{US}??", "", 5),
        # colliding runs over cols 3/4: "BK" then "1.5" starting left of
        # BK's right edge -> split -> centers at ~350 (col 3) and ~405 (col 4)
        Span(
            "char_run",
            f"main{US}0{US}"
            + ";".join(
                f"{ord(c)}:{x0:g}:{x1:g}"
                for c, x0, x1 in [
                    ("B", 330.0, 350.0), ("K", 350.0, 370.0),
                    ("1", 365.0, 392.0), (".", 392.0, 419.0), ("5", 419.0, 445.0),
                ]
            ),
            "", 6,
        ),
    ]
    page = split_pages(spans)[0]
    errs: list = []
    t = build_table(page, CONN_SPEC, errs)
    assert t.rows[0]["Color"] == "BK"
    assert t.rows[0]["Cross-section"] == "1.5"
    msgs = [m for _s, m in errs]
    assert any("replaced col #3: ?? -> BK" in m for m in msgs)
    assert any("replaced col #4: ?? -> 1.5" in m for m in msgs)
    assert all(s.value == "INFO" for s, _m in errs)


def test_char_overlap_unrepairable_half_warns():
    """A colliding block whose center lands outside every cell produces the
    reference's 'could not repair (fully)' WARNING."""
    from indu_doc_transformer_ray.spandoc import US, Span, split_pages

    spans = [
        Span("page_break", "", "", 0),
        Span("cell", f"main{US}0{US}0{US}w1", "", 1),
        Span("cell", f"main{US}0{US}3{US}old", "", 2),
        Span("cell", f"main{US}0{US}4{US}x", "", 3),
        Span(
            "char_run",
            f"main{US}0{US}"
            + ";".join(
                f"{ord(c)}:{x0:g}:{x1:g}"
                for c, x0, x1 in [
                    ("B", 330.0, 350.0), ("K", 350.0, 370.0),
                    # second block [340, 680]: center 510 > table edge 500
                    ("9", 340.0, 360.0), ("9", 600.0, 680.0),
                ]
            ),
            "", 4,
        ),
    ]
    page = split_pages(spans)[0]
    errs: list = []
    t = build_table(page, CONN_SPEC, errs)
    assert t.rows[0]["Color"] == "BK"  # repairable half applied
    sevs = [s.value for s, _m in errs]
    assert "WARNING" in sevs
    assert any("could not repair (fully)" in m for _s, m in errs)
