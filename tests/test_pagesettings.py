"""JSON page-settings loader (S4 parity with reference page_settings.py):
round-trip, rect fixup, missing/corrupt files, PAGE_SPECS-as-parsed-default,
and the headline extensibility story — a brand-new page type introduced by a
JSON entry (plus one emitter registration) extracts end to end."""

import json

from indu_doc_transformer_ray import emit
from indu_doc_transformer_ray.pagemodel import PAGE_SPECS, PageType
from indu_doc_transformer_ray.pagesettings import (
    PageSettings,
    PageSetup,
    TableSetup,
    default_page_settings,
    page_specs_from_settings,
    settings_from_page_specs,
)
from indu_doc_transformer_ray.core import default_config
from indu_doc_transformer_ray.spandoc import US, Span, split_pages
from indu_doc_transformer_ray.store import ExtractionStore


def test_default_specs_match_shipped_json():
    """PAGE_SPECS IS the parsed default settings file."""
    specs = page_specs_from_settings(default_page_settings())
    assert specs == PAGE_SPECS
    assert len(specs) == 9


def test_json_round_trip(tmp_path):
    """to_json -> from_json preserves every field, including the list->tuple
    rect/lines fixup (mirrors the reference's JSON round-trip)."""
    f = tmp_path / "settings.json"
    orig = PageSettings(
        f,
        pages_setup={
            PageType.CONNECTION_LIST: PageSetup(
                tables={
                    "main": TableSetup(
                        key_columns={"name": "connection name"},
                        roi=(1.5, 2.5, 3.5, 4.5),
                        overlap_test_roi=(0.0, 0.0, 10.0, 10.0),
                        lines=[((0.0, 1.0), (2.0, 3.0))],
                        columns={"name": (True,), "Color": (True, "=")},
                        expected_num_tables=2,
                        on_many_join=True,
                        row_offset=-1,
                    )
                },
                search_name="Connection list",
            )
        },
    )
    loaded = PageSettings.init_from_file(f)
    assert loaded.pages_setup == orig.pages_setup
    ts = loaded[PageType.CONNECTION_LIST].tables["main"]
    assert isinstance(ts.roi, tuple) and ts.roi == (1.5, 2.5, 3.5, 4.5)
    assert isinstance(ts.overlap_test_roi, tuple)
    assert ts.lines == [((0.0, 1.0), (2.0, 3.0))]
    assert ts.columns["Color"] == (True, "=")
    assert loaded.to_enum()[PageType.CONNECTION_LIST] == "Connection list"
    assert PageType.CONNECTION_LIST in loaded


def test_missing_file_is_empty_and_corrupt_is_empty(tmp_path):
    s = PageSettings(tmp_path / "nope.json")
    assert s.pages_setup == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json", encoding="utf-8")
    s2 = PageSettings(bad)
    assert s2.pages_setup == {}


def test_specs_round_trip_through_settings(tmp_path):
    """PAGE_SPECS -> settings -> JSON file -> settings -> specs is the
    identity (the lowering is lossless for the fields the pipeline uses)."""
    f = tmp_path / "exported.json"
    settings = settings_from_page_specs(PAGE_SPECS, f)
    reloaded = PageSettings.init_from_file(f)
    assert page_specs_from_settings(reloaded) == PAGE_SPECS


def test_new_page_type_via_json_extracts_end_to_end(tmp_path):
    """A page type that exists ONLY in a JSON settings file classifies,
    reconstructs its table, and emits through a registered emitter."""
    f = tmp_path / "custom.json"
    f.write_text(json.dumps({
        "VALVE_LIST": {
            "tables": {
                "main": {
                    "columns": {
                        "tag": [True],
                        "Ignored": [False],
                        "Valve size": [True],
                    }
                }
            },
            "search_name": "Valve list",
        }
    }), encoding="utf-8")
    settings = PageSettings.init_from_file(f)
    specs = page_specs_from_settings(settings)
    assert "VALVE_LIST" in specs  # unknown name stays a string key

    seen = []

    def emit_valve_list(df, page, store):
        for row in df.rows:
            tag = str(row["tag"]).strip()
            attrs, _ = emit._collect_attrs(store, page, row, ("tag",))
            store.aspect(tag, page, tuple(attrs))
            seen.append(tag)

    emit.register_page_type(specs["VALVE_LIST"], emit_valve_list)
    try:
        spans = [
            Span("page_break", "", "", 0),
            Span("title", "Valve list", "", 1),
            Span("footer_cell", f"project{US}P1", "", 2),
            Span("footer_cell", f"product{US}M1", "", 3),
            # post-header data rows (the corpus encoding carries no header
            # row; column names come from the spec)
            Span("cell", f"main{US}0{US}0{US}=A1", "", 4),
            Span("cell", f"main{US}0{US}1{US}junk", "", 5),
            Span("cell", f"main{US}0{US}2{US}DN50", "", 6),
        ]
        store = ExtractionStore(default_config)
        page = split_pages(spans)[0]
        emit.process_page("doc-1", page, store)
        assert seen == ["=A1"]
        assert not store.error_log
    finally:
        del emit.PAGE_SPECS["VALVE_LIST"]
        del emit.EMITTERS["VALVE_LIST"]
        del emit._NAME_INDEX["valve list"]


def test_page_settings_override_through_pipeline(ray_session, tmp_path):
    """--page-settings plumbing: a JSON override (here: CONNECTION_LIST's
    search name) is applied inside the extraction actors, changing which
    pages classify — the driver's module state never propagates to workers,
    so this exercises the actor-side registration."""
    import json as _json

    import ray.data

    from indu_doc_transformer_ray.fixtures import corpus_table
    from indu_doc_transformer_ray.pipelines.extract import extract_documents

    docs = ray.data.from_arrow(corpus_table(20, seed=11))
    base = extract_documents(docs).to_pandas()

    # retitle CONNECTION_LIST: no corpus page carries the new search name,
    # so every connection-list page stops classifying -> fewer page objects
    override = _json.dumps({
        "CONNECTION_LIST": {
            "tables": {"main": {"columns": {
                "name": [True], "src_pin_tag": [True], "dst_pin_tag": [True],
                "Color": [True], "Cross-section": [True],
            }}},
            "search_name": "Renamed connection list",
        }
    })
    docs2 = ray.data.from_arrow(corpus_table(20, seed=11))
    changed = extract_documents(docs2, page_settings_json=override).to_pandas()
    assert changed["n_page_objects"].sum() < base["n_page_objects"].sum()
