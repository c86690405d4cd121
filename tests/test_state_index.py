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
