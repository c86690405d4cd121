"""Store dedup/merge semantics + per-page-type emission handlers, pinned
against hand-derived expectations (mirroring the reference's God tests,
tests/god_tests/* and tests/test_page_processor.py)."""

import hashlib
import uuid

import pytest

from indu_doc_transformer_ray import core
from indu_doc_transformer_ray.core import default_config
from indu_doc_transformer_ray.emit import (
    emit_cable_overview,
    emit_connection_list,
    emit_device_tag_list,
    emit_plc_diagram,
    emit_structure_identifier_overview,
    emit_topology,
)
from indu_doc_transformer_ray.pagemodel import Severity
from indu_doc_transformer_ray.spandoc import PageFooter
from indu_doc_transformer_ray.store import ExtractionStore, PageCtx
from indu_doc_transformer_ray.tables import RowTable, row_loc


def rt(cols: dict, loc: bool = False) -> RowTable:
    """Build a RowTable from a dict of equal-length column lists."""
    names = list(cols)
    n = len(next(iter(cols.values())))
    rows = [{c: cols[c][i] for c in names} for i in range(n)]
    if loc:
        names = names + ["_loc"]
        for i, r in enumerate(rows):
            r["_loc"] = row_loc(i)
    return RowTable(names, list(range(n)), rows)


def md5uuid(s: str) -> str:
    return str(uuid.UUID(bytes=hashlib.md5(s.encode()).digest()))


def ctx(page_no=0, footer_tags=None, doc="doc-x"):
    footer = PageFooter("Proj", "Prod", footer_tags or [])
    return PageCtx(doc_id=doc, page_no=page_no, footer=footer)


@pytest.fixture()
def store():
    return ExtractionStore(default_config)


# -- store semantics ---------------------------------------------------------

def test_xtarget_dedup_and_type_priority(store):
    t1 = store.xtarget("=F1-D1", ctx(), "other")
    t2 = store.xtarget("=F1-D1", ctx(1), "device")
    assert t1 is t2
    assert t1.target_type == "device"  # upgraded (priority device > other)
    t3 = store.xtarget("=F1-D1", ctx(2), "strip")
    assert t3.target_type == "device"  # NOT downgraded
    assert len(store.targets) == 1


def test_xtarget_rejects_pin_tag(store):
    assert store.xtarget("=F1-D1:1", ctx()) is None
    assert store.error_log == []  # silent rejection, like the reference


def test_xtarget_attr_union(store):
    a1 = store.simple_attr("Color", "BK")
    a2 = store.simple_attr("Color", "BU")
    store.xtarget("=F1-D1", ctx(), "device", (a1,))
    t = store.xtarget("=F1-D1", ctx(), "device", (a2,))
    assert t.attr_guids == {a1.guid, a2.guid}


def test_tag_footer_merge_changes_guid(store):
    t = store.xtarget("-D1", ctx(footer_tags=["=F1", "+L1"]), "device")
    assert t.tag_str == "=F1+L1-D1"
    assert t.guid == md5uuid("=F1+L1-D1")
    # same partial tag under a different footer is a DIFFERENT target
    t2 = store.xtarget("-D1", ctx(footer_tags=["=F2"]), "device")
    assert t2.guid == md5uuid("=F2-D1")
    assert len(store.targets) == 2


def test_tag_creates_aspects(store):
    store.xtarget("=F1+L1-D1", ctx(), "device")
    aspect_strs = {f"{a.separator}{a.value}" for a in store.aspects.values()}
    assert aspect_strs == {"=F1", "+L1", "-D1"}


def test_tag_empty_level_creates_empty_aspect(store):
    # '-D1' with no footer: levels '=' and '+' are present-but-empty
    store.xtarget("-D1", ctx(), "device")
    aspect_strs = {(a.separator, a.value) for a in store.aspects.values()}
    assert aspect_strs == {("=", ""), ("+", ""), ("-", "D1")}


def test_invalid_tag_records_warning(store):
    t = store.xtarget("JUNK", ctx(), "device")
    assert t is not None  # target still created with the invalid tag string
    assert any(
        "Tag is invalid" in msg and sev == "WARNING"
        for _d, _p, sev, msg in store.error_log
    )
    assert t.guid == md5uuid("JUNK")


def test_aspect_composite_rejected(store):
    assert store.aspect("=F1+L1", ctx()) is None
    assert any("composite" in m for *_x, m in store.error_log)


def test_connection_side_effects(store):
    store.connection("=F1-W1", "=F1-A", "=F1-B", ctx())
    types = {t.tag_str: t.target_type for t in store.targets.values()}
    assert types == {"=F1-W1": "cable", "=F1-A": "device", "=F1-B": "device"}
    (conn,) = store.connections.values()
    assert conn.through_guid == md5uuid("=F1-W1")
    assert conn.src_guid == md5uuid("=F1-A")
    assert conn.dst_guid == md5uuid("=F1-B")
    expected_guid = md5uuid(
        "CONN:" + ":".join(
            list(conn.src_guid) + list(conn.dst_guid) + list(conn.through_guid)
        )
    )
    assert conn.guid == expected_guid


def test_connection_with_link_full_chain(store):
    conn = store.connection_with_link(
        "=F1-W1", "=F1-A:1:2", "=F1-B:3", ctx()
    )
    assert conn is not None
    (link,) = store.links.values()
    assert link.name == "=F1-W1"
    assert link.src_pin_name == ":1:2"
    assert link.dst_pin_name == ":3"
    # pins: chain 1->2 registered as two suffixes + dst pin 3
    names = sorted((p.name, p.role, tuple(p.chain)) for p in store.pins.values())
    assert names == [
        ("1", "src", ("1", "2")),
        ("2", "src", ("2",)),
        ("3", "dst", ("3",)),
    ]


def test_connection_with_link_validations(store):
    assert store.connection_with_link(None, "=A", "=B:1", ctx()) is None
    assert any("one/no pins" in m for *_x, m in store.error_log)
    store.error_log.clear()
    assert store.connection_with_link(None, ":1", "=B:1", ctx()) is None
    assert any("one/no targets" in m for *_x, m in store.error_log)


def test_virtual_link_name(store):
    store.connection_with_link(None, "=A:1", "=B:2", ctx())
    (link,) = store.links.values()
    assert link.name == "virtual_link"
    (conn,) = store.connections.values()
    assert conn.through_guid is None


def test_routing_attr_guid_collision_canonicalized(store):
    a1 = store.routing_attr("route", "b;a")
    a2 = store.routing_attr("route", "a;b")
    assert a1.guid == a2.guid
    # canonical winner: lexicographically largest payload (max rule)
    assert a1.value_json == max(
        '{"name":"route","tracks":["a","b"]}',
        '{"name":"route","tracks":["b","a"]}',
    )


# -- emission handlers -------------------------------------------------------

def test_emit_connection_list(store):
    df = rt(
        {
            "name": ["w1", "w2"],
            "src_pin_tag": ["=A:1", ""],
            "dst_pin_tag": ["=B:2", "=C:3"],
            "Color": ["BK", "BU"],
            "Cross-section": ["1.5", ""],
        },
        loc=True,
    )
    emit_connection_list(df, ctx(), store)
    # row 1 skipped with a warning
    assert sum(1 for *_x, m in store.error_log if "skipped" in m) == 1
    (conn,) = store.connections.values()
    (link,) = store.links.values()
    # link attrs: Color, Cross-section simple attrs + the location attr
    attr_types = sorted(
        store.attributes[g].attr_type for g in link.attr_guids
    )
    assert attr_types == [
        "PDFLocationAttribute", "SimpleAttribute", "SimpleAttribute",
    ]
    # endpoints got ONLY the location attribute (reference passes loc only)
    for t in store.targets.values():
        assert all(
            store.attributes[g].attr_type == "PDFLocationAttribute"
            for g in t.attr_guids
        )


def test_emit_device_tag_list(store):
    df = rt(
        {
            "tag": ["=F1-D1", ""],
            "Quantity": ["2", "3"],
            "Designation": ["", "x"],
        },
        loc=True,
    )
    emit_device_tag_list(df, ctx(), store)
    (t,) = store.targets.values()
    assert t.target_type == "device"
    names = sorted(store.attributes[g].name for g in t.attr_guids)
    assert names == ["Quantity", "location"]  # empty Designation dropped


def test_emit_cable_overview_skip_rules(store):
    df = rt(
        {
            "cable_tag": ["=W1", "", "=W2", "=W3"],
            "src_tag": ["=A", "=A", "", ""],
            "dst_tag": ["=B", "=B", "", "=C"],
            "Cable type": ["t", "t", "t", "t"],
        }
    )
    emit_cable_overview(df, ctx(), store)
    # row1: empty cable -> skip; row2: both ends empty -> skip
    assert sum(1 for *_x, m in store.error_log if "skipped" in m) == 2
    # row0 creates a connection; row3 has only dst -> no connection but no skip
    assert len(store.connections) == 1


def test_emit_topology_product(store):
    df = rt(
        {
            "designation": ["=W1"],
            "src_tags": ["=A;=B"],
            "dst_tags": ["=C;=D"],
            "route": ["TR1;TR2"],
        }
    )
    emit_topology(df, ctx(), store)
    assert len(store.connections) == 4  # 2x2 cartesian product
    route_attrs = [
        a for a in store.attributes.values()
        if a.attr_type == "RoutingTracksAttribute"
    ]
    assert len(route_attrs) == 1
    assert '"tracks":["TR1","TR2"]' in route_attrs[0].value_json


def test_emit_plc_diagram(store):
    df = rt(
        {
            "tag": ["=F1-D1"],
            "plc_addr": ["%I0.1"],
            "Rack": ["0"],
            "Module": [""],
        }
    )
    emit_plc_diagram(df, ctx(), store)
    (t,) = store.targets.values()
    plc = [
        store.attributes[g]
        for g in t.attr_guids
        if store.attributes[g].attr_type == "PLCAddressAttribute"
    ]
    assert len(plc) == 1
    assert plc[0].name == "%I0.1"
    assert '"meta":{"Rack":"0"}' in plc[0].value_json  # empty Module dropped


def test_emit_structure_identifier_overview(store):
    df = rt(
        {"tag": ["=F1", "=F1+L1"], "Structure description": ["d1", "d2"]}
    )
    emit_structure_identifier_overview(df, ctx(), store)
    # row 0: single aspect with attr; row 1: composite -> warning, no aspect
    assert [(a.separator, a.value) for a in store.aspects.values()] == [
        ("=", "F1")
    ]
    assert any("composite" in m for *_x, m in store.error_log)
