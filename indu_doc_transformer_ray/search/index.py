"""Search index construction + distributed query evaluation.

The reference builds its index as in-memory ``to_dict`` projections over the
God store (searcher.py:114-145).  Here the index is a Ray Dataset of
(guid, tag, doc_json) rows assembled from the normalized object tables:

- target docs: xtargets ⋈ object_attrs ⋈ attributes (hash joins on GUID,
  grouped attr fold), shaped exactly like XTarget.to_dict
  (xtarget.py:200-215): normalized tag/type + merged attribute search
  entries.
- connection docs: connections ⋈ target-docs (src/dst/through) ⋈ links
  (grouped per connection) ⋈ pins (recursive names per link), shaped like
  Connection.to_dict (connection.py:398-411) plus the special raw-tag
  ``tag``/``src``/``dest`` fields (searcher.py:139-144).

Search = a map_batches boolean filter evaluating the parsed query per doc
(searcher.py:162-209); the tag prefilter is vectorized.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import pyarrow as pa

from ray.data import Dataset

from ..core import normalize_string
from .query import Filter, matches, merge_search_tree, parse_query


# -- search-entry shaping (Attribute.get_search_entries per type) -----------

def attr_search_entries(attr_type: str, name: str, value_json: str) -> dict:
    payload = json.loads(value_json)
    if attr_type == "SimpleAttribute":
        return {normalize_string(name): normalize_string(payload["value"])}
    if attr_type == "RoutingTracksAttribute":
        return {"tracks": payload["tracks"]}
    if attr_type == "PLCAddressAttribute":
        return dict(payload["meta"])
    return {}  # PDFLocationAttribute: not searchable (attributes.py:559-568)


def target_doc(row: dict, attrs: list[dict]) -> dict:
    """XTarget.to_dict shape (xtarget.py:200-215)."""
    merged: dict = {}
    for a in attrs:
        merged.update(
            attr_search_entries(a["attr_type"], a["name"], a["value_json"])
        )
    return {
        "tag": normalize_string(row["tag_str"]),
        "guid": row["guid"],
        "type": normalize_string(row["target_type"]),
        "attributes": merged,
    }


def pin_doc(name: str, role: str, guid: str) -> dict:
    return {"name": name, "role": role, "attributes": {}, "guid": guid}


def link_doc(row: dict, attrs: list[dict],
             pin_names: dict[str, str]) -> dict:
    """Link.to_dict shape (connection.py:271-287); recursive pin names are
    the chain names concatenated (connection.py:108-115)."""
    merged: dict = {}
    for a in attrs:
        merged.update(
            attr_search_entries(a["attr_type"], a["name"], a["value_json"])
        )
    src_name = pin_names.get("src")
    dst_name = pin_names.get("dst")
    return {
        "name": row["name"],
        "src_pin": (
            pin_doc(src_name, "src", pin_names.get("src_guid", ""))
            if src_name is not None
            else {"name": row["src_pin_name"], "role": "src", "attributes": []}
        ),
        "dest_pin": (
            pin_doc(dst_name, "dst", pin_names.get("dst_guid", ""))
            if dst_name is not None
            else {"name": row["dst_pin_name"], "role": "dest", "attributes": []}
        ),
        "attributes": merged,
        "guid": row["guid"],
    }


# -- index assembly from object-table pylists (small/driver side) -----------

class SearchIndex:
    """In-memory index over the merged object tables (the reference's
    searcher holds exactly this; at scale the same docs live in a Dataset —
    see build_target_index_ds)."""

    def __init__(self, tables: dict[str, list[dict]]):
        attrs_by_guid = {a["guid"]: a for a in tables["attributes"]}
        owner_attrs: dict[str, list[dict]] = {}
        for oa in tables["object_attrs"]:
            owner_attrs.setdefault(oa["owner_guid"], []).append(
                attrs_by_guid[oa["attr_guid"]]
            )

        self.targets: dict[str, dict] = {}
        raw_tag: dict[str, str] = {}
        for t in tables["xtargets"]:
            self.targets[t["guid"]] = target_doc(t, owner_attrs.get(t["guid"], []))
            raw_tag[t["guid"]] = t["tag_str"]

        # pins per (link_guid, role): head pin = longest chain
        pins_by_link: dict[tuple[str, str], dict] = {}
        for p in tables["pins"]:
            key = (p["link_guid"], p["role"])
            cur = pins_by_link.get(key)
            if cur is None or len(p["chain"]) > len(cur["chain"]):
                pins_by_link[key] = p

        links_by_conn: dict[str, list[dict]] = {}
        for l in tables["links"]:
            pn: dict[str, str] = {}
            sp = pins_by_link.get((l["guid"], "src"))
            dp = pins_by_link.get((l["guid"], "dst"))
            if sp:
                pn["src"] = "".join(sp["chain"])
                pn["src_guid"] = sp["guid"]
            if dp:
                pn["dst"] = "".join(dp["chain"])
                pn["dst_guid"] = dp["guid"]
            links_by_conn.setdefault(l["connection_guid"], []).append(
                link_doc(l, owner_attrs.get(l["guid"], []), pn)
            )

        self.connections: dict[str, dict] = {}
        for c in tables["connections"]:
            doc = {
                "src_target": self.targets.get(c["src_guid"]),
                "dest_target": self.targets.get(c["dst_guid"]),
                "through_target": self.targets.get(c["through_guid"]),
                "guid": c["guid"],
                "links": links_by_conn.get(c["guid"], []),
                # special raw-tag fields (searcher.py:139-144)
                "tag": raw_tag.get(c["through_guid"], ""),
                "src": raw_tag.get(c["src_guid"], ""),
                "dest": raw_tag.get(c["dst_guid"], ""),
            }
            self.connections[c["guid"]] = doc

    def search_targets(self, query: str) -> list[str]:
        tag, filters = parse_query(query)
        return [
            guid for guid, doc in self.targets.items()
            if matches(doc, tag, filters)
        ]

    def search_connections(self, query: str) -> list[str]:
        tag, filters = parse_query(query)
        return [
            guid for guid, doc in self.connections.items()
            if matches(doc, tag, filters)
        ]

    def target_guide_tree(self) -> dict:
        tree: dict = {}
        for doc in self.targets.values():
            merge_search_tree(tree, doc)
        return tree

    def connection_guide_tree(self) -> dict:
        tree: dict = {}
        for doc in self.connections.values():
            merge_search_tree(tree, doc)
        return tree


# -- distributed index + search ---------------------------------------------

def build_target_index_ds(
    xtargets: Dataset, object_attrs: Dataset, attributes: Dataset,
    num_partitions: int | None = None,
) -> Dataset:
    """Target index as a Dataset: object_attrs ⋈ attributes (hash join on
    attr GUID), fold per owner, join onto xtargets, shape docs per batch.
    Output rows: (guid, tag, doc_json)."""
    import pandas as pd

    from ..functions._util import join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()

    owned = object_attrs.filter(
        lambda r: r["owner_kind"] == "xtarget"
    ).join(
        attributes, join_type="inner", num_partitions=num_partitions,
        on=("attr_guid",), right_on=("guid",),
    )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        attrs = group[["attr_type", "name", "value_json"]].to_dict("records")
        return pd.DataFrame(
            {
                "owner_guid": [group["owner_guid"].iloc[0]],
                "attrs_json": [json.dumps(attrs)],
            }
        )

    folded = owned.groupby("owner_guid").map_groups(fold, batch_format="pandas")
    joined = xtargets.join(
        folded, join_type="left_outer", num_partitions=num_partitions,
        on=("guid",), right_on=("owner_guid",),
    )

    def shape(batch: pa.Table) -> pa.Table:
        guids, tags, docs = [], [], []
        for row in batch.to_pylist():
            attrs = json.loads(row.get("attrs_json") or "[]")
            doc = target_doc(row, attrs)
            guids.append(row["guid"])
            tags.append(doc["tag"])
            docs.append(json.dumps(doc))
        return pa.table(
            {
                "guid": pa.array(guids, pa.string()),
                "tag": pa.array(tags, pa.string()),
                "doc_json": pa.array(docs, pa.string()),
            }
        )

    return joined.map_batches(shape, batch_format="pyarrow")


def search_index_ds(index: Dataset, query: str) -> Dataset:
    """Distributed search: vectorized normalized-substring tag prefilter +
    per-doc filter evaluation inside map_batches; returns matching guids."""
    import pyarrow.compute as pc

    tag, filters = parse_query(query)
    ds = index
    if tag:
        needle = normalize_string(tag)
        ds = ds.map_batches(
            lambda t: t.filter(pc.match_substring(t["tag"], needle)),
            batch_format="pyarrow",
        )

    def evaluate(batch: pa.Table) -> pa.Table:
        keep = []
        for guid, doc_json in zip(
            batch.column("guid").to_pylist(), batch.column("doc_json").to_pylist()
        ):
            doc = json.loads(doc_json)
            if matches(doc, None, filters):
                keep.append(guid)
        return pa.table({"guid": pa.array(keep, pa.string())})

    return ds.map_batches(evaluate, batch_format="pyarrow")
