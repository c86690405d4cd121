"""PDF source adapter: the backend-agnostic rawdict -> span core produces
the same object tables as the equivalent hand-built span encoding (the
round-trip VERDICT r2 item 6 asks for), exercised without the pymupdf
wheel via rawdict-shaped page fixtures."""

import indu_doc_transformer_ray.pagemodel  # noqa: F401  (import-order guard)
from indu_doc_transformer_ray.core import default_config
from indu_doc_transformer_ray.deltas import oracle_tables
from indu_doc_transformer_ray.emit import process_document
from indu_doc_transformer_ray.pagesettings import default_page_settings
from indu_doc_transformer_ray.sources.pdf import (
    a3_clip,
    footer_coordinates,
    get_paper_size,
    have_pymupdf,
    page_to_span_dicts,
)
from indu_doc_transformer_ray.spandoc import US, Span
from indu_doc_transformer_ray.store import ExtractionStore

W, H = 1191.05, 842.39  # A3 reference sheet -> A3_HORIZONTAL footer layout


def _span(text, x0, y0, size=10.0, cw=6.0):
    """A rawdict text span: chars laid out left-to-right, cw pt each."""
    chars = [
        {"c": c, "bbox": (x0 + i * cw, y0, x0 + (i + 1) * cw, y0 + 10.0)}
        for i, c in enumerate(text)
    ]
    return {
        "bbox": (x0, y0, x0 + len(text) * cw, y0 + 10.0),
        "size": size,
        "chars": chars,
    }


ROWS = [
    ["w1", "=F01+L1-D01:1", "=F02+L2-D02:2", "BK", "0.5"],
    ["w2", "=F01+L1-D03:3", "=F02+L2-D04:1", "BU", "1.5"],
]


def _page_dict(overlap=False):
    spans = [
        _span("Connection list", 100, 40, size=24.0),
        _span("P-alpha", 200, 805),  # project rect (170,797,397,831)
        _span("Prod-A", 710, 805),  # product rect (702,797,885,831)
    ]
    # footer tag grid: start (W-306.75, H-45.6); cells 102.25 x 11.4
    fx, fy = W - 3 * 102.25, H - 4 * 11.4
    spans.append(_span("=F01", fx + 5, fy + 1, cw=4.0))  # slot 0:0
    spans.append(_span("+L1", fx + 5, fy + 2 * 11.4 + 1, cw=4.0))  # slot 2:0
    spans.append(_span("&DOC1", fx + 102.25 + 5, fy + 1, cw=4.0))  # slot 0:1
    # table: roi (100,100,600,300) -> 5 uniform columns of width 100
    for r, row in enumerate(ROWS):
        y = 120.0 + r * 20.0
        for col, val in enumerate(row):
            spans.append(_span(val, 100.0 + col * 100.0 + 5.0, y))
    if overlap:
        # colliding char runs in row 0's Color column: "GN" then a second
        # block starting left of the first's right edge -> M4 split fires
        spans.append(_span("GN", 100.0 + 3 * 100.0 + 30.0, 121.0, cw=20.0))
        spans.append(_span("2.5", 100.0 + 3 * 100.0 + 45.0, 122.0, cw=18.0))
    return {
        "width": W,
        "height": H,
        "blocks": [{"type": 0, "lines": [{"spans": [s]} for s in spans]}],
    }


def _settings_with_roi():
    s = default_page_settings()
    s["CONNECTION_LIST"].tables["main"].roi = (100.0, 100.0, 600.0, 300.0)
    return s


def _hand_built_spans():
    """The same page content, hand-encoded the way the fixtures do it."""
    enc = [
        ("page_break", ""),
        ("title", "Connection list"),
        ("footer_cell", f"project{US}P-alpha"),
        ("footer_cell", f"product{US}Prod-A"),
        ("footer_cell", f"0:0{US}=F01"),
        ("footer_cell", f"0:1{US}&DOC1"),
        ("footer_cell", f"2:0{US}+L1"),
    ]
    for r, row in enumerate(ROWS):
        for col, val in enumerate(row):
            enc.append(("cell", f"main{US}{r}{US}{col}{US}{val}"))
    return [Span(k, t, "", i) for i, (k, t) in enumerate(enc)]


def test_geometry_helpers():
    assert get_paper_size(595.78, 842.39) == "A4"
    assert get_paper_size(842.39, 595.78) == "A4"  # rotated
    assert get_paper_size(2384.44, 1684.28) == "A1_HORIZONTAL"
    assert get_paper_size(999.0, 999.0) == "A3_HORIZONTAL"  # default
    assert a3_clip((100, 100, 600, 300), W, H) == (100, 100, 600, 300)
    fc = footer_coordinates(W, H)
    assert len(fc["cells"]) == 4 and len(fc["cells"][0]) == 3


def test_pdf_page_round_trips_to_same_object_tables():
    got = page_to_span_dicts(_page_dict(), _settings_with_roi(), "d", 0, 0)
    spans = [Span(**d) for d in got]

    sa = ExtractionStore(default_config)
    process_document("doc-pdf", spans, sa)
    sb = ExtractionStore(default_config)
    process_document("doc-pdf", _hand_built_spans(), sb)

    ta, tb = oracle_tables(sa), oracle_tables(sb)
    assert set(ta) == set(tb)
    for name in ta:
        ka = sorted(map(repr, ta[name]))
        kb = sorted(map(repr, tb[name]))
        assert ka == kb, f"{name} differs"
    # the page produced real objects, not an empty store
    assert ta["xtargets"], ta


def test_pdf_overlap_emits_char_run_and_repair_fires():
    got = page_to_span_dicts(
        _page_dict(overlap=True), _settings_with_roi(), "d", 0, 0
    )
    runs = [d for d in got if d["kind"] == "char_run"]
    assert len(runs) == 1 and runs[0]["text"].startswith(f"main{US}0{US}")

    store = ExtractionStore(default_config)
    process_document("doc-pdf", [Span(**d) for d in got], store)
    msgs = [r["message"] for r in oracle_tables(store)["errors"]]
    assert any("overlap detected" in m for m in msgs), msgs


def test_offsets_and_page_breaks_accumulate():
    settings = _settings_with_roi()
    p0 = page_to_span_dicts(_page_dict(), settings, "d", 0, 0)
    p1 = page_to_span_dicts(_page_dict(), settings, "d", 1, len(p0))
    offs = [d["offset"] for d in p0 + p1]
    assert offs == list(range(len(offs)))
    assert [d["kind"] for d in (p0 + p1)].count("page_break") == 2


def test_minipdf_rejects_out_of_subset():
    """Round-5: the reader no longer gates on pymupdf (the vendored
    minipdf fallback drives the page-dict walk), but the fallback must
    refuse LOUDLY outside its narrow uncompressed subset rather than
    silently mis-read a real-world compressed PDF."""
    import pytest

    from indu_doc_transformer_ray.sources.pdf import minipdf_page_dicts

    with pytest.raises(ValueError, match="minipdf"):
        minipdf_page_dicts(b"%PDF-1.7\nnothing here")
    with pytest.raises(ValueError, match="compressed"):
        minipdf_page_dicts(
            b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nendobj\n"
        )
