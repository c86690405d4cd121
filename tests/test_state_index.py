"""Shared-mutable fingerprint index (raw-actor escape hatch): routing
correctness of the sharded set, and incremental_dedup semantics on planted
cross-wave and within-wave duplicates."""

import pandas as pd

from indu_doc_transformer_ray.state.dedup_index import (
    FingerprintIndex,
    incremental_dedup,
)


def test_fingerprint_index_routing(ray_session):
    idx = FingerprintIndex(n_shards=4)
    fps = [f"{i:032x}" for i in range(200)]
    idx.add(fps[:120])
    assert idx.size() == 120
    got = idx.contains(fps)
    assert got == [i < 120 for i in range(200)]
    # re-adding is idempotent
    idx.add(fps[:120])
    assert idx.size() == 120


def test_incremental_dedup_planted_duplicates(ray_session, tmp_path):
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": f"unique text {i}"})
    rows[7]["text"] = rows[4]["text"]  # odd 7 duplicates snapshot doc 4
    rows[9]["text"] = rows[3]["text"]  # odd 9 duplicates odd 3 (NOT snapshot)
    df = pd.DataFrame(rows)
    df["lang"] = "en"
    df["source"] = "s"
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")

    out = (
        incremental_dedup(str(tmp_path), n_shards=3)
        .to_pandas()
        .set_index("doc_id")["is_dup"]
    )
    # only odd docs appear
    assert sorted(out.index) == list(range(1, 40, 2))
    assert out[7] == 1  # text exists in the even snapshot
    assert out[9] == 0  # within-wave dup only: snapshot doesn't contain it
    assert out.drop([7, 9]).sum() == 0


def test_bloom_probe_no_false_negatives(ray_session):
    """Bloom membership must cover every true duplicate (no false
    negatives) with a small deterministic false-positive rate."""
    from indu_doc_transformer_ray.functions.sketches import bloom_probe
    from indu_doc_transformer_ray.state.dedup_index import incremental_dedup

    sf = "/root/testdata/sf0.001"
    truth = incremental_dedup(sf).to_pandas().set_index("doc_id")["is_dup"]
    maybe = bloom_probe(sf).to_pandas().set_index("doc_id")["maybe_dup"]
    assert sorted(truth.index) == sorted(maybe.index)
    # every exact dup is flagged by the filter
    assert (maybe[truth == 1] == 1).all()
    # false-positive rate bounded (3 hashes into 2^17 bits, tiny fill)
    fp = ((maybe == 1) & (truth == 0)).sum() / max(1, (truth == 0).sum())
    assert fp < 0.05, fp
