"""Byte-level contract of the delta encoding.

``store_to_deltas`` hand-assembles its JSON payloads with CPython's C string
escaper instead of ``json.dumps`` (hot path: every object of every document).
These tests pin that the fast form is byte-identical to
``canonical_json`` — including adversarial strings (quotes, backslashes,
control chars, non-ASCII, the \\x1f unit separator itself) and None fields.
"""

from __future__ import annotations

import json

from indu_doc_transformer_ray.deltas import store_to_deltas
from indu_doc_transformer_ray.spandoc import US
from indu_doc_transformer_ray.store import (
    AspectRec,
    AttrRec,
    ConnRec,
    ExtractionStore,
    LinkRec,
    PinRec,
    canonical_json,
)
from indu_doc_transformer_ray.core import default_config

NASTY = [
    "plain",
    'quo"te',
    "back\\slash",
    "unié中\U0001f600",
    "ctrl\n\t\x01",
    f"unit{US}sep",
    "",
]


def _reference_payloads(store):
    """The pre-optimization encoding, verbatim (json.dumps, sort_keys)."""
    out = {}
    for a in store.attributes.values():
        out[f"attribute{US}{a.guid}"] = canonical_json(
            {"attr_type": a.attr_type, "name": a.name, "value_json": a.value_json}
        )
    for asp in store.aspects.values():
        out[f"aspect{US}{asp.guid}"] = canonical_json(
            {"separator": asp.separator, "value": asp.value}
        )
    for l in store.links.values():
        out[f"link{US}{l.guid}"] = canonical_json(
            {
                "name": l.name,
                "connection_guid": l.connection_guid,
                "src_pin_name": l.src_pin_name,
                "dst_pin_name": l.dst_pin_name,
            }
        )
    for c in store.connections.values():
        out[f"connection{US}{c.guid}"] = canonical_json(
            {"src_guid": c.src_guid, "dst_guid": c.dst_guid,
             "through_guid": c.through_guid}
        )
    for p in store.pins.values():
        out[f"pin{US}{p.guid}"] = canonical_json(
            {"name": p.name, "role": p.role, "chain": p.chain,
             "link_guid": p.link_guid}
        )
    return out


def test_fast_payloads_match_canonical_json():
    store = ExtractionStore(default_config)
    for i, s in enumerate(NASTY):
        store.attributes[f"ag{i}"] = AttrRec(
            f"ag{i}", "SimpleAttribute", s, json.dumps({"name": s, "value": s})
        )
        store.aspects[f"sg{i}"] = AspectRec(f"sg{i}", "+", s)
        store.links[f"lg{i}"] = LinkRec(f"lg{i}", s, f"cg{i}", s + "1", s + "2")
        store.pins[f"pg{i}"] = PinRec(f"pg{i}", s, "src", [s, s + "x"], f"lg{i}")
    store.connections["cg0"] = ConnRec("cg0", "s", "d", "t")
    store.connections["cg1"] = ConnRec("cg1", None, None, None)
    store.connections["cg2"] = ConnRec("cg2", NASTY[3], None, NASTY[4])

    ref = _reference_payloads(store)
    got = {k: v for k, v in store_to_deltas(store) if not k.endswith(US)}
    for mkey, payload in got.items():
        kind = mkey.split(US)[0]
        if kind in ("xtarget", "xtarget_attr", "aspect_attr", "link_attr"):
            continue
        assert payload == ref[mkey], mkey
    assert set(ref) <= set(got)


def test_payloads_round_trip_through_json():
    store = ExtractionStore(default_config)
    store.pins["p"] = PinRec("p", NASTY[1], "dst", NASTY[:3], "lk")
    store.connections["c"] = ConnRec("c", None, NASTY[2], None)
    for mkey, payload in store_to_deltas(store):
        if payload.startswith("{"):
            json.loads(payload)  # must stay valid JSON
