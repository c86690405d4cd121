"""run_pack.py gates: token conservation, exact per-sequence fill,
reassembly equality vs a single-process cut, and lineage resume."""

import glob
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF = "/root/testdata/sf0.001"
SEQ_LEN = 256


@pytest.fixture(scope="module")
def packed(ray_session, tmp_path_factory):
    from run_pack import pack_and_write

    out = str(tmp_path_factory.mktemp("packed"))
    manifest = pack_and_write(SF, out, seq_len=SEQ_LEN)
    assert glob.glob(f"{out}/sequences/shard=*/*.parquet")
    # hive read recovers the partition column
    pieces = pd.read_parquet(f"{out}/sequences")
    pieces["shard"] = pieces["shard"].astype("int64")
    return manifest, pieces, out


def _reference_stream():
    from indu_doc_transformer_ray.functions.text import TOKEN_RE

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id")
    toks = []
    for t in docs["text"]:
        toks.extend(TOKEN_RE.findall(t.lower()))
    return toks


def test_token_conservation_and_fill(packed):
    manifest, pieces, _ = packed
    ref = _reference_stream()
    assert manifest["n_tokens"] == len(ref) == pieces["n_tokens"].sum()
    per_seq = pieces.groupby("seq_id")["n_tokens"].sum().sort_index()
    assert manifest["n_seqs"] == per_seq.index.max() + 1
    # every sequence except the last is exactly full
    assert (per_seq.iloc[:-1] == SEQ_LEN).all()
    assert 0 < per_seq.iloc[-1] <= SEQ_LEN


def test_sequences_reassemble_the_token_stream(packed):
    _, pieces, _ = packed
    ref = _reference_stream()
    got = []
    for _, seq in pieces.sort_values(["seq_id", "part_pos"]).groupby(
        "seq_id", sort=True
    ):
        got.extend(" ".join(seq["piece"]).split(" "))
    assert got == ref


def test_shard_layout_and_part_pos(packed):
    _, pieces, out = packed
    assert (pieces["seq_id"] % 64 == pieces["shard"]).all()
    # part_pos is the piece's token offset inside its sequence: pieces of a
    # sequence tile [0, fill) without overlap
    for _, seq in pieces.groupby("seq_id"):
        seq = seq.sort_values("part_pos")
        expect = 0
        for _, r in seq.iterrows():
            assert r["part_pos"] == expect
            expect += r["n_tokens"]


def test_lineage_resume_skips(packed, ray_session):
    from run_pack import pack_and_write

    manifest, _, out = packed
    again = pack_and_write(SF, out, seq_len=SEQ_LEN)
    assert again.get("skipped") is True
    assert again["n_tokens"] == manifest["n_tokens"]
