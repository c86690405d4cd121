"""Distributed search-index build + query vs the in-memory SearchIndex."""

import pytest

import ray.data

from indu_doc_transformer_ray.core import default_config
from indu_doc_transformer_ray.deltas import oracle_tables
from indu_doc_transformer_ray.emit import process_document
from indu_doc_transformer_ray.fixtures import corpus_table
from indu_doc_transformer_ray.search.index import (
    SearchIndex,
    build_target_index_ds,
    search_index_ds,
)
from indu_doc_transformer_ray.spandoc import Span
from indu_doc_transformer_ray.store import ExtractionStore


@pytest.fixture(scope="module")
def tables():
    tab = corpus_table(12, seed=5)
    store = ExtractionStore(default_config)
    for doc_id, raw in zip(
        tab.column("doc_id").to_pylist(), tab.column("spans").to_pylist()
    ):
        process_document(
            doc_id,
            [Span(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in raw],
            store,
        )
    return oracle_tables(store)


def test_distributed_target_index_matches_memory(ray_session, tables):
    xt = ray.data.from_items(tables["xtargets"])
    oa = ray.data.from_items(tables["object_attrs"])
    at = ray.data.from_items(tables["attributes"])
    index = build_target_index_ds(xt, oa, at, num_partitions=4)

    mem = SearchIndex(tables)
    for q in ("@type=device", "@type=cable", "@attributes(color)=b"):
        got = sorted(
            r["guid"] for r in search_index_ds(index, q).take_all()
        )
        want = sorted(mem.search_targets(q))
        assert got == want, q

    # tag prefilter path
    some_tag = next(
        t["tag_str"] for t in tables["xtargets"] if t["tag_str"].startswith("=")
    )
    q = some_tag[:6]
    got = sorted(r["guid"] for r in search_index_ds(index, q).take_all())
    want = sorted(mem.search_targets(q))
    assert got == want


def test_distributed_connection_index_matches_memory(ray_session, tables):
    import json

    from indu_doc_transformer_ray.search.index import (
        build_connection_index_ds,
        build_target_index_ds,
    )

    xt = ray.data.from_items(tables["xtargets"])
    oa = ray.data.from_items(tables["object_attrs"])
    at = ray.data.from_items(tables["attributes"])
    target_index = build_target_index_ds(xt, oa, at, num_partitions=2)

    conn_index = build_connection_index_ds(
        ray.data.from_items(tables["connections"]),
        ray.data.from_items(tables["links"]),
        ray.data.from_items(tables["pins"]),
        oa,
        at,
        target_index,
        num_partitions=2,
    )
    got = {
        r["guid"]: json.loads(r["doc_json"]) for r in conn_index.take_all()
    }
    mem = SearchIndex(tables)
    assert set(got) == set(mem.connections)

    def canon(doc):
        d = dict(doc)
        d["links"] = sorted(
            (json.dumps(l, sort_keys=True) for l in d["links"])
        )
        return json.dumps(d, sort_keys=True)

    mismatches = [
        g for g in got if canon(got[g]) != canon(mem.connections[g])
    ]
    assert mismatches == [], mismatches[:2]

    # distributed search over the connection index matches in-memory search
    for q in ("@guid", "@links.attributes(color)=b"):
        ds_hits = sorted(
            r["guid"] for r in search_index_ds(conn_index, q).take_all()
        )
        assert ds_hits == sorted(mem.search_connections(q)), q
