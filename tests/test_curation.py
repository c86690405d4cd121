"""Curation-operator semantics beyond the DuckDB hash check: shard_assign
is a balanced permutation, mixture weights normalize, decontamination flags
a doc that verbatim-shares a benchmark n-gram, scrub hash matches a direct
local computation."""

import hashlib
import re

from indu_doc_transformer_ray.functions import curation

SF = "/root/testdata/sf0.001"


def test_shard_assign_balanced_permutation(ray_session):
    import pyarrow.parquet as pq

    out = curation.shard_assign(SF, n_shards=8).to_pandas()
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(out) == n
    assert out["doc_id"].is_unique
    # round-robin deal: shard sizes differ by at most one
    sizes = out.groupby("shard").size()
    assert len(sizes) == 8 and sizes.max() - sizes.min() <= 1
    # (shard, pos) is a bijection onto 0..n-1
    ranks = (out["pos"] * 8 + out["shard"]).sort_values().to_numpy()
    assert (ranks == range(n)).all()


def test_mixture_weights_normalize(ray_session):
    out = curation.mixture_weights(SF).to_pandas()
    assert (out["weight_scaled"] > 0).all()
    # integer-floored shares sum to at most 1e6 and within #sources of it
    s = int(out["share_ppm"].sum())
    assert 1_000_000 - len(out) < s <= 1_000_000


def test_decontaminate_flags_shared_ngram(ray_session):
    import pyarrow.parquet as pq

    from indu_doc_transformer_ray.functions.text import TOKEN_RE

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    bench = docs[docs["doc_id"] % 97 == 0]
    rest = docs[docs["doc_id"] % 97 != 0]

    def grams(text):
        t = TOKEN_RE.findall(text.lower())
        return {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}

    bench_set = set().union(*(grams(t) for t in bench["text"]))
    expect = {
        int(r.doc_id): len(grams(r.text) & bench_set)
        for r in rest.itertuples()
    }
    out = curation.decontaminate(SF).to_pandas()
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    assert got == expect
    assert (out["contaminated"] == (out["n_overlap"] > 0).astype(int)).all()
    # the op must be non-vacuous on this corpus: some overlap exists
    assert out["contaminated"].sum() > 0


def test_blocklist_scrub_matches_local(ray_session):
    import pyarrow.parquet as pq

    out = curation.blocklist_scrub(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    pat = re.compile(r"\b(customer|spark)\b")
    row = docs.iloc[docs["text"].str.len().idxmax()]
    want_n = len(pat.findall(row["text"]))
    want_h = hashlib.md5(pat.sub("<scrubbed>", row["text"]).encode()).hexdigest()
    got = out.loc[int(row["doc_id"])]
    assert int(got["n_redacted"]) == want_n and got["scrub_hash"] == want_h
    assert out["n_redacted"].sum() > 0  # non-vacuous blocklist


def test_mixture_sample_respects_quotas(ray_session):
    weights = curation.mixture_weights(SF).to_pandas().set_index("source")
    out = curation.mixture_sample(SF, n_total=50).to_pandas()
    sizes = out.groupby("source").size()
    for src, got in sizes.items():
        quota = int(weights.loc[src, "share_ppm"] * 50 // 1_000_000)
        assert got == quota
    # floor allocation: total within #sources of the target
    assert 50 - len(weights) < sizes.sum() <= 50
    assert out["doc_id"].is_unique


def test_shard_assign_adversarial_ids_match_local_order(ray_session, tmp_path):
    """Sparse/huge int64 doc_ids: the distributed two-level rank must equal
    the local md5-order reference exactly."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    ids = np.unique(
        np.concatenate(
            [
                np.array([0, 1, 7, 999_983, 10**12, 2**62], dtype="int64"),
                rng.integers(0, 2**63 - 1, 300).astype("int64"),
            ]
        )
    )
    pd.DataFrame(
        {"doc_id": ids, "text": "x", "lang": "en", "source": "s", "n_chars": 1}
    ).to_parquet(tmp_path / "documents.parquet")

    got = (
        curation.shard_assign(str(tmp_path), n_shards=5)
        .to_pandas()
        .set_index("doc_id")
    )
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    for rk, i in enumerate(order):
        assert int(got.loc[i, "shard"]) == rk % 5
        assert int(got.loc[i, "pos"]) == rk // 5


def test_decontaminate_distributed_fallback_matches_broadcast(ray_session):
    """An oversized benchmark slice must take the broadcast-free semi-join
    path (max_broadcast_grams=0 forces it) and return row-identical
    results — the VERDICT r2 item-5 guard."""
    a = (
        curation.decontaminate(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        curation.decontaminate(SF, max_broadcast_grams=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b[a.columns])


def test_run_curation_writes_exact_keep_set(ray_session, tmp_path):
    """tools/run_curation.py: the written corpus holds EXACTLY the
    curation_pipeline keep set with its bin assignments, partitioned by
    write shard; a second run skips on the manifest lineage."""
    import glob
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "tools")
    from run_curation import WRITE_SHARDS, curate_and_write

    from indu_doc_transformer_ray.functions.text import curation_pipeline

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    man = curate_and_write(sf, out)
    assert man["complete"] and not man.get("skipped")

    want = curation_pipeline(sf).to_pandas().set_index("doc_id")
    got = pq.read_table(f"{out}/corpus").to_pandas()
    assert sorted(got["doc_id"]) == sorted(want.index)
    for row in got.itertuples(index=False):
        assert row.bin_id == want.loc[row.doc_id, "bin_id"]
        assert row.n_tokens == want.loc[row.doc_id, "n_tokens"]
    # document payloads survive: text round-trips from the source table
    src = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")
    sample = got.head(20)
    for row in sample.itertuples(index=False):
        assert row.text == src.loc[row.doc_id, "text"]
    # hive layout + manifest resume
    assert glob.glob(f"{out}/corpus/shard=*")
    man2 = curate_and_write(sf, out)
    assert man2.get("skipped")


def test_run_dedup_job_end_to_end(ray_session, tmp_path):
    """tools/run_dedup.py writes the REWRITTEN corpus (keep-one-copy):
    planted shared passage survives only in the keeper doc, metadata is
    re-attached, the hive layout is readable, and a re-run skips via
    lineage."""
    import sys

    import pandas as pd

    from indu_doc_transformer_ray.functions.dedup import SUBSTR_K

    sys.path.insert(0, "tools")
    from run_dedup import dedup_and_write

    passage = " ".join(f"shared{i}" for i in range(SUBSTR_K + 4))
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma " + passage,
         "lang": "en", "source": "web"},
        {"doc_id": 1, "text": "delta epsilon zeta " + passage,
         "lang": "de", "source": "pdf"},
        {"doc_id": 2, "text": "eta theta iota kappa",
         "lang": "fr", "source": "web"},
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(rows).to_parquet(f"{sf}/documents.parquet")
    out = tmp_path / "out"

    m = dedup_and_write(str(sf), str(out), write_shards=4)
    assert m["complete"] and m["n_docs"] == 3
    assert m["n_words_removed"] == SUBSTR_K + 4

    corpus = pd.read_parquet(f"{out}/corpus").set_index("doc_id").sort_index()
    assert corpus.loc[0, "residual"] == "alpha beta gamma " + passage
    assert corpus.loc[1, "residual"] == "delta epsilon zeta"
    assert corpus.loc[1, "lang"] == "de" and corpus.loc[1, "source"] == "pdf"
    assert corpus.loc[2, "residual"] == "eta theta iota kappa"
    assert set(corpus["shard"]) <= {0, 1, 2, 3}

    m2 = dedup_and_write(str(sf), str(out), write_shards=4)
    assert m2.get("skipped") is True


def test_audit_job_report_and_resume(ray_session, tmp_path):
    """run_audit composes SQL-oracled audit queries into one atomic
    report: (1) payload keys and bounded row counts present; (2) a second
    run with unchanged inputs skips via lineage and returns the identical
    payloads; (3) a changed input row count invalidates the lineage and
    recomputes."""
    import json
    import sys

    sys.path.insert(0, ".")
    from tools.run_audit import AUDIT_QUERIES, audit

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "audit")
    first = audit(sf, out)
    assert first["complete"] and not first.get("skipped")
    assert set(first["payloads"]) == set(AUDIT_QUERIES)
    for name, rows in first["payloads"].items():
        # bounded-payload gate: source x decile (quantile_norm_chars,
        # 180 rows) is the widest domain now
        assert 1 <= len(rows) <= 256, name

    second = audit(sf, out)
    assert second.get("skipped") is True
    assert second["payloads"] == json.load(
        open(f"{out}/report.json")
    )["payloads"]

    # lineage break: claim a different input row count in the manifest
    rpt = json.load(open(f"{out}/report.json"))
    rpt["input_rows"]["documents"] += 1
    with open(f"{out}/report.json", "w") as f:
        json.dump(rpt, f)
    third = audit(sf, out)
    assert third["complete"] and not third.get("skipped")
    assert third["payloads"] == first["payloads"]


def test_features_job_oracle_resume_and_invalidation(ray_session, tmp_path):
    """run_features publishes the SQL-oracled user_features table
    hive-partitioned: (1) the written table hash-equals the DuckDB oracle
    at sf0.001; (2) a second run skips via lineage; (3) a params change
    invalidates and recomputes (no stale shards — the publish replaces the
    whole directory)."""
    import json
    import sys

    import duckdb

    sys.path.insert(0, ".")
    from tools.run_features import build_features

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "features")
    first = build_features(sf, out, shards=8)
    assert first["complete"] and not first.get("skipped")
    assert first["n_features"] == 12

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    want = con.execute(entrymod.oracle_sql()["user_features"]).df()
    got = (
        duckdb.sql(f"SELECT * FROM read_parquet('{out}/features/*/*.parquet', hive_partitioning=true)")
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == first["n_users"]
    assert (got["shard"] == got["user_id"] % 8).all()
    for c in want.columns:
        assert (got[c].astype(str).values == want[c].astype(str).values).all(), c

    second = build_features(sf, out, shards=8)
    assert second.get("skipped") is True

    third = build_features(sf, out, shards=4)
    assert third["complete"] and not third.get("skipped")
    got2 = duckdb.sql(
        f"SELECT max(shard) m, count(*) n FROM read_parquet('{out}/features/*/*.parquet', hive_partitioning=true)"
    ).df()
    assert int(got2.loc[0, "m"]) <= 3 and int(got2.loc[0, "n"]) == first["n_users"]
