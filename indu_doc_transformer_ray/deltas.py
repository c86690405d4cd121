"""Object-delta encoding and the distributed merge contract.

Every per-document ExtractionStore flushes to a flat stream of
``(mkey, payload)`` string pairs.  The cross-document merge — the
reference's God dedup/merge semantics (SURVEY.md §2.4) — is then EXACTLY
one vectorized aggregate:

    groupby(mkey).aggregate(Max(payload))

because every delta kind is encoded so lexicographic-max-of-payload is its
merge rule:

    kind           mkey                                    payload / merge
    -------------  --------------------------------------  ----------------------
    xtarget        xtarget␟guid                            "prio␟type␟tag_str" — max
                                                           picks the max-priority
                                                           type (god.py:377-391)
    xtarget_attr   xtarget_attr␟guid␟attr_guid             "" — presence (attr union)
    aspect         aspect␟guid                             json — identical per key
    aspect_attr    aspect_attr␟guid␟attr_guid              "" — presence
    link           link␟guid                               json — identical per key
    link_attr      link_attr␟guid␟attr_guid                "" — presence
    attribute      attribute␟guid                          json — max(value_json),
                                                           canonical collision rule
    connection     connection␟guid                         json — identical per key
    pin            pin␟guid                                json — identical per key
    page_object    page_object␟doc␟page␟kind␟guid          "" — presence (set dedup)
    error          error␟doc␟page␟sev␟md5(msg)             json — identical per key

(␟ is the unit separator \\x1f.)  Attribute membership is normalized into
its own rows (``*_attr``) instead of being embedded in object payloads —
this is what makes the shuffle a pure Min/Max exchange with no per-group
Python, the thing a ``map_groups`` merge would cost at 10^12-doc scale.
"""

from __future__ import annotations

import json
from json.encoder import encode_basestring_ascii as _esc
from typing import Any, Iterable

from .spandoc import US
from .store import ExtractionStore, TYPE_PRIORITY, canonical_json

# ``_esc`` is CPython's C string escaper (the one json.dumps uses with its
# default ensure_ascii=True); the hand-assembled payloads below are
# byte-identical to ``canonical_json`` on these fixed flat all-string shapes
# (keys pre-sorted, separators (",", ":")) at ~1/10 the cost — pinned by
# tests/test_deltas.py::test_fast_payloads_match_canonical_json.


def store_to_deltas(store: ExtractionStore) -> list[tuple[str, str]]:
    """Flush a (per-document) store into merge-ready delta pairs for the
    GLOBALLY-merged kinds.  Doc-scoped rows (page_objects, errors) never
    collide across documents — their keys embed the doc_id — so they bypass
    the shuffle entirely (``store_to_local_rows``)."""
    out: list[tuple[str, str]] = []
    add = out.append

    for a in store.attributes.values():
        add(
            (
                f"attribute{US}{a.guid}",
                f'{{"attr_type":{_esc(a.attr_type)},"name":{_esc(a.name)}'
                f',"value_json":{_esc(a.value_json)}}}',
            )
        )
    for t in store.targets.values():
        add(
            (
                f"xtarget{US}{t.guid}",
                f"{TYPE_PRIORITY[t.target_type]}{US}{t.target_type}{US}{t.tag_str}",
            )
        )
        for g in t.attr_guids:
            add((f"xtarget_attr{US}{t.guid}{US}{g}", ""))
    for asp in store.aspects.values():
        add(
            (
                f"aspect{US}{asp.guid}",
                f'{{"separator":{_esc(asp.separator)},"value":{_esc(asp.value)}}}',
            )
        )
        for g in asp.attr_guids:
            add((f"aspect_attr{US}{asp.guid}{US}{g}", ""))
    for l in store.links.values():
        add(
            (
                f"link{US}{l.guid}",
                f'{{"connection_guid":{_esc(l.connection_guid)}'
                f',"dst_pin_name":{_esc(l.dst_pin_name)}'
                f',"name":{_esc(l.name)}'
                f',"src_pin_name":{_esc(l.src_pin_name)}}}',
            )
        )
        for g in l.attr_guids:
            add((f"link_attr{US}{l.guid}{US}{g}", ""))
    for c in store.connections.values():
        add(
            (
                f"connection{US}{c.guid}",
                '{"dst_guid":%s,"src_guid":%s,"through_guid":%s}'
                % (
                    _esc(c.dst_guid) if c.dst_guid is not None else "null",
                    _esc(c.src_guid) if c.src_guid is not None else "null",
                    _esc(c.through_guid) if c.through_guid is not None else "null",
                ),
            )
        )
    for p in store.pins.values():
        add(
            (
                f"pin{US}{p.guid}",
                f'{{"chain":[{",".join(map(_esc, p.chain))}]'
                f',"link_guid":{_esc(p.link_guid)}'
                f',"name":{_esc(p.name)},"role":{_esc(p.role)}}}',
            )
        )
    return out


def store_to_local_tuples(
    store: ExtractionStore,
) -> tuple[list[tuple], list[tuple]]:
    """Doc-scoped output rows as plain tuples, set-deduplicated like the
    reference's mapper sets (god.py:91-144): ``(page_objects, errors)`` —
    page_objects as ``(doc_id, page_no, kind, guid)``, errors as
    ``(doc_id, page_no, severity, message)``."""
    page_objects = [
        t for t in sorted(set(store.mapping_log)) if t[2] != "error"
    ]
    errors = sorted(set(store.error_log))
    return page_objects, errors


def store_to_local_rows(
    store: ExtractionStore,
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Dict-shaped view of ``store_to_local_tuples`` (test/oracle paths)."""
    pobjs, errs = store_to_local_tuples(store)
    page_objects = [
        {"doc_id": d, "page_no": p, "object_kind": k, "object_guid": g}
        for d, p, k, g in pobjs
    ]
    errors = [
        {"doc_id": d, "page_no": p, "severity": s, "message": m}
        for d, p, s, m in errs
    ]
    return page_objects, errors


def local_combine(pairs: Iterable[tuple[str, str]]) -> dict[str, str]:
    """Pre-shuffle combiner: max-payload per key within a batch.  Applying
    this before the groupby collapses cross-document duplicates early (the
    classic partial-aggregate push-down)."""
    acc: dict[str, str] = {}
    for k, v in pairs:
        prev = acc.get(k)
        if prev is None or v > prev:
            acc[k] = v
    return acc


# Final normalized table names produced by the merge.
TABLE_NAMES = (
    "xtargets", "connections", "links", "pins", "aspects", "attributes",
    "object_attrs", "page_objects", "errors",
)


def assemble_rows(mkey: str, payload: str) -> tuple[str, dict[str, Any]]:
    """Decode one merged ``(mkey, max_payload)`` pair into its normalized
    output-table row.  Returns ``(table_name, row)``."""
    parts = mkey.split(US)
    kind = parts[0]
    if kind == "xtarget":
        _prio, ttype, tag_str = payload.split(US, 2)
        return "xtargets", {
            "guid": parts[1], "tag_str": tag_str, "target_type": ttype,
        }
    if kind in ("xtarget_attr", "aspect_attr", "link_attr"):
        return "object_attrs", {
            "owner_kind": kind.removesuffix("_attr"),
            "owner_guid": parts[1],
            "attr_guid": parts[2],
        }
    if kind == "aspect":
        d = json.loads(payload)
        return "aspects", {
            "guid": parts[1], "separator": d["separator"], "value": d["value"],
        }
    if kind == "attribute":
        d = json.loads(payload)
        return "attributes", {
            "guid": parts[1], "attr_type": d["attr_type"], "name": d["name"],
            "value_json": d["value_json"],
        }
    if kind == "link":
        d = json.loads(payload)
        return "links", {"guid": parts[1], **d}
    if kind == "connection":
        d = json.loads(payload)
        return "connections", {"guid": parts[1], **d}
    if kind == "pin":
        d = json.loads(payload)
        return "pins", {"guid": parts[1], **d}
    if kind == "page_object":
        return "page_objects", {
            "doc_id": parts[1], "page_no": int(parts[2]),
            "object_kind": parts[3], "object_guid": parts[4],
        }
    if kind == "error":
        d = json.loads(payload)
        return "errors", d
    raise ValueError(f"unknown delta kind: {kind}")


def assemble_tables(
    merged: Iterable[tuple[str, str]]
) -> dict[str, list[dict[str, Any]]]:
    """Group merged pairs into normalized table rows (driver-side/test-size
    convenience; the Ray pipeline does the same decode inside map_batches)."""
    out: dict[str, list[dict[str, Any]]] = {n: [] for n in TABLE_NAMES}
    for k, v in merged:
        name, row = assemble_rows(k, v)
        out[name].append(row)
    return out


def oracle_tables(store: ExtractionStore) -> dict[str, list[dict[str, Any]]]:
    """Normalized golden tables from a (global, single-process) store."""
    merged = sorted(local_combine(store_to_deltas(store)).items())
    out = assemble_tables(merged)
    page_objects, errors = store_to_local_rows(store)
    out["page_objects"] = page_objects
    out["errors"] = errors
    return out
