"""Checkpoint/resume semantics of the sharded runner."""

import json
import os
import shutil

import pytest

import ray.data

from indu_doc_transformer_ray.fixtures import corpus_table
from indu_doc_transformer_ray.pipelines.runner import (
    object_table,
    run_extraction,
    run_merge,
    spans_output,
)


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    ds = ray.data.from_arrow(corpus_table(40, seed=11)).repartition(8)
    ds.write_parquet(d)
    return d


def test_run_and_resume(corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    results = run_extraction(corpus_dir, out_dir, shards=4)
    assert len(results) == 4
    assert all(not r.skipped for r in results)
    assert sum(r.n_docs for r in results) == 40
    merge1 = run_merge(out_dir)
    assert merge1["n_objects"] > 0

    spans1 = {
        r["doc_id"]: r["spans"]
        for r in spans_output(out_dir).take_all()
    }

    # simulate a crash: lose shard 2 (data + manifest) and the merge output
    shutil.rmtree(os.path.join(out_dir, "extracted", "shard=00002"))
    os.remove(os.path.join(out_dir, "manifests", "shard-00002.json"))
    os.remove(os.path.join(out_dir, "manifests", "merge.json"))
    shutil.rmtree(os.path.join(out_dir, "objects"))

    results2 = run_extraction(corpus_dir, out_dir, shards=4)
    skipped = {r.shard: r.skipped for r in results2}
    assert skipped == {0: True, 1: True, 2: False, 3: True}
    merge2 = run_merge(out_dir)
    assert merge2["n_objects"] == merge1["n_objects"]

    spans2 = {
        r["doc_id"]: r["spans"]
        for r in spans_output(out_dir).take_all()
    }
    assert spans1.keys() == spans2.keys()
    for d in spans1:
        assert spans1[d] == spans2[d]


def test_manifest_contents(corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out2")
    run_extraction(corpus_dir, out_dir, shards=2)
    m = json.load(open(os.path.join(out_dir, "manifests", "shard-00000.json")))
    assert m["complete"] is True
    assert m["n_docs"] > 0 and m["n_pages"] > 0 and m["n_spans_in"] > 0
    assert m["wall_s"] > 0
    assert all(os.path.exists(f) for f in m["input_files"])  # lineage


def test_object_table_read(corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out3")
    run_extraction(corpus_dir, out_dir, shards=2)
    run_merge(out_dir)
    xt = object_table(out_dir, "xtargets").to_pandas()
    assert set(xt.columns) == {"guid", "tag_str", "target_type"}
    assert len(xt) > 0
    assert xt["guid"].is_unique


def test_run_extraction_progress_events(ray_session, tmp_path):
    """The on_event surface mirrors the reference's plugin event emitter
    (plugins/events.py:32-127): started -> per-shard completion -> completed."""
    import ray.data

    from indu_doc_transformer_ray.fixtures import corpus_table
    from indu_doc_transformer_ray.pipelines.runner import run_extraction

    src = tmp_path / "corpus"
    ray.data.from_arrow(corpus_table(12, seed=3)).repartition(2).write_parquet(
        str(src)
    )
    events = []
    results = run_extraction(
        str(src), str(tmp_path / "out"), shards=2, on_event=events.append
    )
    kinds = [e["type"] for e in events]
    assert kinds[0] == "processing_started"
    assert kinds[-1] == "processing_completed"
    assert kinds.count("shard_completed") == 2
    assert events[-1]["n_docs"] == sum(r.n_docs for r in results) == 12
    # page-granular progress: the final drained snapshot accounts every doc
    # and page (monotone cumulative counts, pct vs the metadata doc total)
    prog = [e for e in events if e["type"] == "progress"]
    assert prog, "no progress events emitted"
    docs_seq = [p["docs_done"] for p in prog]
    assert docs_seq == sorted(docs_seq)
    assert prog[-1]["docs_done"] == 12
    assert prog[-1]["total_docs"] == 12
    assert prog[-1]["pct"] == 100.0
    assert prog[-1]["pages_done"] == sum(r.n_pages for r in results)


def test_incremental_ingest_invalidates_stale_state(ray_session, tmp_path):
    """Growing the input corpus between runs must recompute affected shards
    AND the merge — a stale manifest may only skip work for the exact file
    list it covered."""
    import ray.data

    from indu_doc_transformer_ray.fixtures import corpus_table
    from indu_doc_transformer_ray.pipelines.runner import (
        run_extraction,
        run_merge,
    )

    src = tmp_path / "corpus"
    ray.data.from_arrow(corpus_table(10, seed=5)).repartition(2).write_parquet(
        str(src)
    )
    out = str(tmp_path / "out")
    r1 = run_extraction(str(src), out, shards=2)
    m1 = run_merge(out)
    assert sum(r.n_docs for r in r1) == 10

    # incremental ingest: 6 new documents arrive as a new file
    extra = corpus_table(16, seed=5).slice(10, 6)
    import pyarrow.parquet as pq

    pq.write_table(extra, str(src / "zz_new.parquet"))

    r2 = run_extraction(str(src), out, shards=2)
    m2 = run_merge(out)
    assert sum(r.n_docs for r in r2) == 16
    assert not all(r.skipped for r in r2)  # changed shards recomputed
    assert m2["n_objects"] > m1["n_objects"]  # merge re-folded, not skipped

    # from-scratch run over the grown corpus gives the identical result
    out2 = str(tmp_path / "out2")
    run_extraction(str(src), out2, shards=2)
    m3 = run_merge(out2)
    assert m3["n_objects"] == m2["n_objects"]


def test_shard_count_invariance(corpus_dir, tmp_path):
    """The WHOLE job is a pure function of the input, not the partitioning:
    different shard counts must yield byte-identical span sequences and the
    identical merged object set (the 256-node-vs-8-node contract)."""
    import pyarrow.dataset as pads

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    run_extraction(corpus_dir, out_a, shards=3)
    run_extraction(corpus_dir, out_b, shards=8)
    ma = run_merge(out_a)
    mb = run_merge(out_b)
    assert ma["n_objects"] == mb["n_objects"]

    sa = {r["doc_id"]: r["spans"] for r in spans_output(out_a).take_all()}
    sb = {r["doc_id"]: r["spans"] for r in spans_output(out_b).take_all()}
    assert sa == sb

    def merged_rows(out):
        t = pads.dataset(os.path.join(out, "objects")).to_table(
            columns=["table_name", "mkey", "payload"]
        )
        return sorted(zip(*[t.column(c).to_pylist()
                            for c in ("table_name", "mkey", "payload")]))

    assert merged_rows(out_a) == merged_rows(out_b)
