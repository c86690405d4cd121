"""Corpus-curation operators for training-data preparation that sit
downstream of extraction: benchmark decontamination, temperature-based
source-mixture weighting, deterministic global shuffle -> shard assignment,
and blocklist scrubbing (the PII-redaction shape, exercised with a term
blocklist because the synthetic corpus carries no real PII).

Every op is a vectorized ``map_batches`` stage over a column-pruned read of
the ``documents`` table, emits integers/hashes only (bit-exact DuckDB
oracles), and documents its partitioning assumption for the 100-TB path.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from .text import TOKEN_RE

#: tokenizer mirrored in SQL as ``regexp_extract_all(lower(text), '[a-z0-9_]+')``
_TOKEN_SQL = "regexp_extract_all(lower(text), '[a-z0-9_]+')"


def _read_docs(sf_dir: str, columns: list[str]) -> Dataset:
    from ._util import read_small_aware

    return read_small_aware(f"{sf_dir}/documents.parquet", columns=columns)


# -- decontamination --------------------------------------------------------
# At real scale the benchmark side is a FIXED, SMALL external artifact
# (eval-set n-grams: thousands of docs, not the corpus), so collecting its
# distinct shingles to the driver and broadcasting via ray.put is the
# canonical shape — the corpus side streams and never shuffles.  Here the
# "benchmark" is carved deterministically out of the corpus (doc_id % 97)
# so the op is self-contained and oracle-checkable — which also means an
# adversarial call could make the "benchmark" corpus-proportional, so the
# collection is SIZE-GUARDED: above ``max_broadcast_grams`` distinct
# shingles the op switches to a fully distributed bucketed semi-join that
# never lands the gram set on the driver (VERDICT r2 item 5).

#: Max distinct benchmark n-grams the driver will collect + broadcast
#: (~a few hundred MB of strings).  Above this, the distributed path runs.
MAX_BROADCAST_GRAMS = 2_000_000


def decontaminate(
    sf_dir: str,
    n: int = 5,
    bench_mod: int = 97,
    max_broadcast_grams: int = MAX_BROADCAST_GRAMS,
) -> Dataset:
    """Benchmark n-gram decontamination: flag every non-benchmark document
    that shares at least one word ``n``-gram with the benchmark slice
    (``doc_id % bench_mod == 0``).  Output per surviving doc:
    (doc_id, n_overlap = distinct shared n-grams, contaminated = 0/1).

    Two physical plans, same answer (tests assert equality):

    - benchmark gram set <= ``max_broadcast_grams``: collect the distinct
      grams once, ``ray.put`` broadcast, corpus streams with zero shuffles
      (the real-benchmark shape);
    - above the guard: bucketed semi-join — (gram, doc_id) rows from both
      sides co-locate by gram-hash bucket, each bucket counts per-doc hits
      against its bench grams, a second doc-bucketed fold sums partials and
      fills zeros.  Nothing corpus-proportional ever reaches the driver.
    """
    import pandas as pd

    def grams_of(toks: list[str]) -> set[str]:
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    def _mod_mask(batch: pa.Table, keep_bench: bool) -> pa.Table:
        # modulo isn't expressible in Dataset.filter(expr=...); mask
        # vectorized with numpy instead
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % bench_mod == 0) == keep_bench
        return batch.filter(pa.array(mask))

    def bench_grams(batch: pa.Table) -> pa.Table:
        batch = _mod_mask(batch, keep_bench=True)
        out: set[str] = set()
        for text in batch.column("text").to_pylist():
            out.update(grams_of(TOKEN_RE.findall(text.lower())))
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    # distinct-per-batch bench grams, held in the OBJECT STORE (spillable),
    # so sizing the set never lands it on the driver
    bench_mat = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(bench_grams, batch_format="pyarrow")
        .materialize()
    )

    if bench_mat.count() <= max_broadcast_grams:
        # broadcast path (upper bound: per-batch distinct rows >= true
        # distinct count, so the guard can only be conservative)
        bench_set = set(bench_mat.to_pandas()["g"])
        bref = ray.put(bench_set)

        def score(batch: pa.Table) -> pa.Table:
            batch = _mod_mask(batch, keep_bench=False)
            bset = ray.get(bref)
            ids, n_over, flag = [], [], []
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                k = len(grams_of(TOKEN_RE.findall(text.lower())) & bset)
                ids.append(doc_id)
                n_over.append(k)
                flag.append(1 if k else 0)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_overlap": pa.array(n_over, pa.int64()),
                    "contaminated": pa.array(flag, pa.int64()),
                }
            )

        return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            score, batch_format="pyarrow"
        )

    # -- distributed fallback: bucketed gram semi-join -----------------
    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)

    def _gb(g: str) -> int:
        # stable gram-hash bucket (never builtin hash(): seed-randomized)
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % nb

    def corpus_gram_rows(batch: pa.Table) -> pd.DataFrame:
        batch = _mod_mask(batch, keep_bench=False)
        gbs, gs, ids = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for g in grams_of(TOKEN_RE.findall(text.lower())):
                gbs.append(_gb(g))
                gs.append(g)
                ids.append(doc_id)
        return pd.DataFrame(
            {
                "gb": pd.array(gbs, dtype="int32"),
                "g": pd.array(gs, dtype="str"),
                "doc_id": pd.array(ids, dtype="int64"),
            }
        )

    def bench_gram_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "gb": pd.array([_gb(g) for g in t["g"]], dtype="int32"),
                "g": t["g"].astype("str"),
                "doc_id": pd.array([-1] * len(t), dtype="int64"),
            }
        )

    def bucket_hits(t: pd.DataFrame) -> pd.DataFrame:
        # a gram lives in exactly ONE bucket and per-doc emits are already
        # distinct, so in-bucket per-doc hit counts are globally additive
        bset = set(t.loc[t["doc_id"] < 0, "g"])
        hits = t[(t["doc_id"] >= 0) & t["g"].isin(bset)]
        agg = hits.groupby("doc_id").size().reset_index(name="part")
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].astype("int64"),
                "part": agg["part"].astype("int64"),
            }
        )

    partials = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(corpus_gram_rows, batch_format="pyarrow")
        .union(bench_mat.map_batches(bench_gram_rows, batch_format="pandas"))
        .groupby("gb")
        .map_groups(bucket_hits, batch_format="pandas")
    )

    def zero_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].astype("int64")
        ids = ids[ids % bench_mod != 0]
        return pd.DataFrame(
            {
                "doc_id": ids.to_numpy(),
                "part": pd.array([0] * len(ids), dtype="int64"),
            }
        )

    def fold(t: pd.DataFrame) -> pd.DataFrame:
        agg = t.groupby("doc_id")["part"].sum().reset_index()
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].astype("int64"),
                "n_overlap": agg["part"].astype("int64"),
                "contaminated": (agg["part"] > 0).astype("int64"),
            }
        )

    def add_db(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["db"] = (t["doc_id"] % nb).astype("int32")
        return t

    return (
        partials.union(
            _read_docs(sf_dir, ["doc_id"]).map_batches(
                zero_rows, batch_format="pandas"
            )
        )
        .map_batches(add_db, batch_format="pandas")
        .groupby("db")
        .map_groups(fold, batch_format="pandas")
    )


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKEN_SQL} AS w FROM documents
), grams AS (
  SELECT doc_id, array_to_string(w[i : i + 4], ' ') AS g
  FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
), hits AS (
  SELECT gr.doc_id, COUNT(DISTINCT gr.g) AS n_overlap
  FROM grams gr JOIN bench b USING (g)
  WHERE gr.doc_id % 97 <> 0
  GROUP BY gr.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(CASE WHEN COALESCE(h.n_overlap, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


# -- source-mixture weighting ------------------------------------------------

def mixture_weights(sf_dir: str) -> Dataset:
    """Temperature-based source mixing weights (alpha = 0.5): per source,
    token mass -> weight = sqrt(tokens), normalized to parts-per-million.
    sqrt is IEEE-correctly-rounded, so ``floor(sqrt(n)*1e6 + 0.5)`` is
    bit-identical across numpy/libm/DuckDB; normalization then happens in
    INTEGER arithmetic (w * 1e6 // total) so the output is exact.  Token
    counting is a partial aggregate inside ``map_batches`` (one int per
    (batch, source)); the groupby touches O(sources) rows, and the final
    normalization is over the tiny source domain."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        for src, text in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            c = agg.setdefault(src, [0, 0])
            c[0] += 1
            c[1] += len(TOKEN_RE.findall(text.lower()))
        return pa.table(
            {
                "source": pa.array(list(agg), pa.string()),
                "n_docs": pa.array([v[0] for v in agg.values()], pa.int64()),
                "n_tokens": pa.array([v[1] for v in agg.values()], pa.int64()),
            }
        )

    per_source = (
        _read_docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .to_pandas()  # O(sources) rows — the mixture table itself
    )
    w = per_source["n_tokens"].map(
        lambda x: int(math.floor(math.sqrt(float(x)) * 1_000_000 + 0.5))
    )
    total = int(w.sum())
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "source": per_source["source"],
                "n_docs": per_source["n_docs"].astype("int64"),
                "n_tokens": per_source["n_tokens"].astype("int64"),
                "weight_scaled": w.astype("int64"),
                "share_ppm": (w * 1_000_000 // total).astype("int64"),
            }
        )
    )


MIXTURE_WEIGHTS_SQL = f"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_TOKEN_SQL})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs, n_tokens,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS weight_scaled
  FROM per
)
SELECT source, n_docs, n_tokens, weight_scaled,
       CAST(weight_scaled * 1000000
            // CAST(SUM(weight_scaled) OVER () AS BIGINT) AS BIGINT)
         AS share_ppm
FROM w
"""


# -- deterministic global shuffle -> shard assignment ------------------------

def shard_assign(
    sf_dir: str, n_shards: int = 8, prefix_hex: int = 3
) -> Dataset:
    """Deterministic global training-data shuffle: rank every document by
    ``md5(doc_id)`` and deal ranks round-robin into ``n_shards`` shards
    (shard sizes differ by at most 1; order within a shard is the hash
    order).  The global rank is a bounded two-level scan: bucket by the
    first ``prefix_hex`` hex chars of the hash (4096 fixed buckets — the
    driver side is CONSTANT in corpus size; add a hex char per 16x more
    parallelism), fold bucket counts into prefix offsets on the driver,
    broadcast, then finish the rank per bucket with an in-group sort +
    cumcount.  Output: (doc_id, shard, pos)."""
    import pandas as pd
    from ray.data.aggregate import Count

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hk = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "hk": pa.array(hk, pa.string()),
                "bkt": pa.array(
                    [int(h[:prefix_hex], 16) for h in hk], pa.int64()
                ),
            }
        )

    keyed_ds = _read_docs(sf_dir, ["doc_id"]).map_batches(
        keyed, batch_format="pyarrow"
    )

    counts = (
        keyed_ds.groupby("bkt")
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # <= 16^prefix_hex rows — constant in corpus size
        .sort_values("bkt")
    )
    offsets = dict(zip(counts["bkt"], counts["c"].cumsum() - counts["c"]))
    oref = ray.put(offsets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = int(ray.get(oref)[int(g["bkt"].iloc[0])])
        g = g.sort_values(["hk", "doc_id"])
        rk = off + pd.RangeIndex(len(g))
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64").values,
                "shard": (rk % n_shards).astype("int64"),
                "pos": (rk // n_shards).astype("int64"),
            }
        )

    return keyed_ds.groupby("bkt").map_groups(rank_bucket, batch_format="pandas")


SHARD_ASSIGN_SQL = """
SELECT doc_id,
       CAST((rn - 1) % 8 AS BIGINT) AS shard,
       CAST((rn - 1) // 8 AS BIGINT) AS pos
FROM (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
"""


# -- blocklist scrubbing -----------------------------------------------------

class _BlocklistScrubber:
    """Stateful scrub stage: the (potentially large) blocklist compiles to
    one alternation regex ONCE per actor; per batch it counts matches and
    hashes the redacted text (the full scrubbed column would be the real
    output — the hash keeps the equality surface compact)."""

    def __init__(self, terms: tuple[str, ...]):
        self.pat = re.compile(r"\b(" + "|".join(map(re.escape, terms)) + r")\b")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_red, hashes = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ids.append(doc_id)
            n_red.append(len(self.pat.findall(text)))
            scrubbed = self.pat.sub("<scrubbed>", text)
            hashes.append(hashlib.md5(scrubbed.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_redacted": pa.array(n_red, pa.int64()),
                "scrub_hash": pa.array(hashes, pa.string()),
            }
        )


def blocklist_scrub(
    sf_dir: str, terms: tuple[str, ...] = ("customer", "spark")
) -> Dataset:
    """Blocklist redaction over the corpus (the PII-scrub shape: compiled
    pattern in actor state, streaming map_batches, no shuffle).  Output:
    (doc_id, n_redacted, scrub_hash = md5 of the redacted text)."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _BlocklistScrubber,
        fn_constructor_args=(terms,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


BLOCKLIST_SCRUB_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\b(customer|spark)\b'))
            AS BIGINT) AS n_redacted,
       md5(regexp_replace(text, '\b(customer|spark)\b', '<scrubbed>', 'g'))
         AS scrub_hash
FROM documents
"""


def mixture_sample(sf_dir: str, n_total: int = 100) -> Dataset:
    """Materialize the ``mixture_weights`` policy into an actual sample:
    each source gets a quota of ``share_ppm * n_total // 1e6`` documents
    (integer floor — the sum may undershoot ``n_total`` by < #sources,
    deterministically), filled by the source's lowest-md5-ranked docs.
    The quota table is O(sources) and broadcast via ``ray.put``; the rank
    is a BOUNDED-HEAP top-K (quota <= n_total): each batch prunes locally
    to its source quota, so the per-source fold sees at most
    quota x n_blocks candidate rows — a hot source never co-locates its
    full document set in one task."""
    import pandas as pd

    quotas = {
        r["source"]: int(r["share_ppm"] * n_total // 1_000_000)
        for _, r in mixture_weights(sf_dir).to_pandas().iterrows()
    }
    qref = ray.put(quotas)

    def local_cap(t: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        t = t.copy()
        t["hk"] = [
            hashlib.md5(str(int(i)).encode()).hexdigest() for i in t["doc_id"]
        ]
        t = t.sort_values(["source", "hk", "doc_id"])
        t = t[t.groupby("source").cumcount() < t["source"].map(q).fillna(0)]
        return t[["source", "doc_id", "hk"]]

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        quota = ray.get(qref).get(str(g["source"].iloc[0]), 0)
        g = g.sort_values(["hk", "doc_id"])
        g = g.assign(rk=pd.RangeIndex(len(g)) + 1)
        g = g[g["rk"] <= quota]
        return pd.DataFrame(
            {
                "source": g["source"].values,
                "doc_id": g["doc_id"].astype("int64").values,
                "rk": g["rk"].astype("int64").values,
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "source"])
        .map_batches(local_cap, batch_format="pandas")
        .groupby("source")
        .map_groups(final_cap, batch_format="pandas")
    )


MIXTURE_SAMPLE_SQL = f"""
WITH mw AS ({MIXTURE_WEIGHTS_SQL}),
alloc AS (
  SELECT source, CAST(share_ppm * 100 // 1000000 AS BIGINT) AS quota FROM mw
), ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT r.source, r.doc_id, CAST(r.rk AS BIGINT) AS rk
FROM ranked r JOIN alloc a USING (source)
WHERE r.rk <= a.quota
"""


# -- weighted sampling --------------------------------------------------------

#: 2^52 — md5 prefix bits that fit a double EXACTLY, so the Ray and DuckDB
#: sides compute bit-identical uniforms (the repo's md5-seeded-op oracle
#: technique).
_U52 = 4503599627370496.0


def weighted_sample(sf_dir: str, k: int = 20) -> "object":
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis A-ES:
    every document draws a deterministic uniform u from its md5 (52-bit
    prefix, exactly representable as a double) and ranks by the key
    ln(u)/w — the top-``k`` keys are a weighted sample where a document's
    inclusion probability is proportional to its weight (here w = token
    count + 1).  The distributed shape is the one-pass bounded-heap
    selection: each batch prunes locally to its k best keys, the driver
    folds the tiny candidate union — no shuffle, corpus never collected.
    Deterministic hash math makes even the "random" sample hash-checkable
    (WEIGHTED_SAMPLE_SQL mirrors the exact double arithmetic).  Output:
    (doc_id, w, rk) — integers only."""
    import math

    import pandas as pd

    def keyed(t: pa.Table) -> pa.Table:
        ids, ws, keys = [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            w = len(TOKEN_RE.findall(text.lower())) + 1
            v = int(
                hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16
            )
            # math.log (libm), NOT np.log: DuckDB's ln() is the same libm
            # call, so the doubles match bit-for-bit
            keys.append(math.log((v + 1) / _U52) / w)
            ids.append(doc_id)
            ws.append(w)
        local = (
            pd.DataFrame({"doc_id": ids, "w": ws, "key": keys})
            .sort_values(["key", "doc_id"], ascending=[False, True])
            .head(k)
        )
        return pa.table(
            {
                "doc_id": pa.array(local["doc_id"].astype("int64"), pa.int64()),
                "w": pa.array(local["w"].astype("int64"), pa.int64()),
                "key": pa.array(local["key"], pa.float64()),
            }
        )

    cand = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(keyed, batch_format="pyarrow")
        .to_pandas()  # <= k x n_blocks rows — the tiny candidate union
    )
    cand = cand.sort_values(["key", "doc_id"], ascending=[False, True]).head(k)
    cand = cand.reset_index(drop=True)
    return pd.DataFrame(
        {
            "doc_id": cand["doc_id"].astype("int64"),
            "w": cand["w"].astype("int64"),
            "rk": pd.array(range(1, len(cand) + 1), dtype="int64"),
        }
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len({_TOKEN_SQL}) + 1 AS w
  FROM documents
), keyed AS (
  SELECT doc_id, w,
         ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                  AS UBIGINT) + 1) / {_U52!r}) / w AS key
  FROM t
)
SELECT doc_id, CAST(w AS BIGINT) AS w,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rk
FROM keyed
QUALIFY rk <= 20
ORDER BY rk
"""


def dataset_split(sf_dir: str) -> "object":
    """Deterministic hash-based train/val/test split — the assignment every
    training pipeline needs to be stable across runs, machines and corpus
    growth (a doc's split NEVER changes when other docs are added, unlike
    rank-based splits): ``md5(doc_id) % 100`` -> <80 train, <90 val, else
    test.  One streaming pass, per-batch combiner fold, final groupby is
    |sources| x 3 rows.  Output: (source, split, n_docs, n_chars)."""
    import pandas as pd

    docs = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])

    def assign(t: pa.Table) -> pd.DataFrame:
        ids = t.column("doc_id").to_pylist()
        h = [
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % 100
            for i in ids
        ]
        split = [
            "train" if b < 80 else ("val" if b < 90 else "test") for b in h
        ]
        df = pd.DataFrame(
            {
                "source": t.column("source").to_pylist(),
                "split": pd.Series(split, dtype="object"),
                "n_docs": 1,
                "n_chars": t.column("n_chars").to_pylist(),
            }
        )
        return (
            df.groupby(["source", "split"], as_index=False)[["n_docs", "n_chars"]]
            .sum()
            .astype({"n_docs": "int64", "n_chars": "int64"})
        )

    out = (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby(["source", "split"])
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("n_chars", alias_name="n_chars"),
        )
        .to_pandas()  # |sources| * 3 rows
    )
    out = out.astype({"n_docs": "int64", "n_chars": "int64"})
    return out.sort_values(["source", "split"]).reset_index(drop=True)


DATASET_SPLIT_SQL = """
SELECT source,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
         AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM (
  SELECT source, n_chars,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) % 100 AS b
  FROM documents
)
GROUP BY 1, 2
ORDER BY source, split
"""


# -- DSIR-style hashed n-gram importance weights ------------------------------

#: Feature-hash bucket count for the DSIR importance estimator.  The driver
#: holds exactly two count vectors of this length regardless of corpus size.
DSIR_BUCKETS = 256


def dsir_weights(sf_dir: str, target_mod: int = 97) -> Dataset:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
    restated over hashed unigram features: documents matching
    ``doc_id % target_mod == 0`` act as the target distribution (the
    benchmark-like slice, same carve as ``decontaminate``); every other
    document gets an importance weight

        w(doc) = sum over tokens of  ln(p_target[b] / p_raw[b])

    with md5-hashed token buckets ``b`` and +1 Laplace smoothing on both
    distributions.  Two streaming passes, zero corpus shuffles:

    - pass A folds per-batch (is_target, bucket) token counts into
      2 x DSIR_BUCKETS partial rows; one tiny groupby lands the two count
      vectors on the driver (O(DSIR_BUCKETS) state at any corpus size);
    - the per-bucket log-ratios are floored to integer micro-units (the
      ``bm25_topk``/``pmi_bigrams`` exact-float technique: exact-int
      operands cast to double, one division, same libm ln) and broadcast;
    - pass B scores each non-target document as an integer sum of its
      tokens' bucket weights.

    Output: (doc_id, n_tokens, dsir_mu) for every non-target document."""
    import math

    from collections import Counter

    import numpy as np

    from ray.data.aggregate import Sum

    B = DSIR_BUCKETS

    def _bucket(tok: str) -> int:
        return int.from_bytes(
            hashlib.md5(tok.encode()).digest()[:8], "big"
        ) % B

    def count_partial(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()  # key: (is_target, bucket)
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            is_t = 1 if doc_id % target_mod == 0 else 0
            for tok in TOKEN_RE.findall(text.lower()):
                cnt[(is_t, _bucket(tok))] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "is_t": pa.array([k[0] for k in keys], pa.int64()),
                "bk": pa.array([k[1] for k in keys], pa.int64()),
                "partial_n": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    counts = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby(["is_t", "bk"])
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()  # <= 2*B rows BY CONSTRUCTION
    )
    t_n = np.zeros(B, dtype=np.int64)
    r_n = np.zeros(B, dtype=np.int64)
    for is_t, bk, n in counts.itertuples(index=False):
        (t_n if is_t else r_n)[int(bk)] = int(n)
    T, R = int(t_n.sum()), int(r_n.sum())
    # float() on each exact-int product mirrors the oracle's ::DOUBLE casts
    # bit-for-bit at any magnitude (int/int true division would differ past
    # 2^53); ln is the same libm on both sides.
    lam_mu = np.array(
        [
            math.floor(
                math.log(
                    float((int(t_n[b]) + 1) * (R + B))
                    / float((int(r_n[b]) + 1) * (T + B))
                )
                * 1e6
            )
            for b in range(B)
        ],
        dtype=np.int64,
    )

    def score(t: pa.Table) -> pa.Table:
        ids, toks_n, mus = [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            if doc_id % target_mod == 0:
                continue
            toks = TOKEN_RE.findall(text.lower())
            ids.append(doc_id)
            toks_n.append(len(toks))
            mus.append(int(sum(int(lam_mu[_bucket(tok)]) for tok in toks)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks_n, pa.int64()),
                "dsir_mu": pa.array(mus, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


DSIR_WEIGHTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKEN_SQL}) AS t FROM documents
), b AS (
  SELECT doc_id,
         CAST(CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT)
              % {DSIR_BUCKETS} AS BIGINT) AS bk,
         (doc_id % 97 = 0) AS is_t
  FROM toks
), grid AS (
  SELECT unnest(range({DSIR_BUCKETS})) AS bk
), cnt AS (
  SELECT grid.bk,
         COUNT(*) FILTER (WHERE b.is_t) AS t_n,
         COUNT(*) FILTER (WHERE NOT b.is_t) AS r_n
  FROM grid LEFT JOIN b ON grid.bk = b.bk GROUP BY grid.bk
), tot AS (
  SELECT SUM(t_n) AS tt, SUM(r_n) AS rr FROM cnt
), lam AS (
  SELECT bk,
         CAST(FLOOR(ln(((t_n + 1) * (rr + {DSIR_BUCKETS}))::DOUBLE
                       / ((r_n + 1) * (tt + {DSIR_BUCKETS}))::DOUBLE) * 1e6)
              AS BIGINT) AS l_mu
  FROM cnt, tot
), sc AS (
  SELECT b.doc_id, COUNT(*) AS n_tokens, SUM(lam.l_mu) AS mu
  FROM b JOIN lam ON b.bk = lam.bk WHERE NOT b.is_t GROUP BY b.doc_id
)
SELECT d.doc_id, CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sc.mu, 0) AS BIGINT) AS dsir_mu
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
WHERE d.doc_id % 97 <> 0
"""


def corpus_diff(sf_dir: str) -> Dataset:
    """Snapshot diff between two corpus versions (the CDC/delta-compare
    shape for incremental recrawls): v1 is the documents table, v2 is a
    deterministically derived second snapshot (docs with ``doc_id%17==0``
    deleted, docs with ``doc_id%13==0`` rewritten — self-contained and
    oracle-checkable like decontaminate's benchmark carve).  Both sides
    emit (bucket, doc_id, md5-prefix fingerprint, side) rows — the
    exchange ships 16-byte fingerprints, never text — and ONE doc-bucket
    co-location classifies every key: present-in-both with equal hashes is
    dropped, giving (doc_id, change) for change ∈ {modified, deleted}.
    At real scale v2 is a second parquet/Lance snapshot path; the plan is
    identical."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)

    def _fp64(texts: list[str]) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                >> 1  # keep it in int64 range; both sides shift identically
                for t in texts
            ),
            dtype=np.int64,
        )

    def v1_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        fp = _fp64(t.column("text").to_pylist())
        return pa.table(
            {
                "b": pa.array((ids & (nb - 1)).astype("int32")),
                "doc_id": pa.array(ids.astype("int64")),
                "fp": pa.array(fp),
                "side": pa.array(np.ones(len(ids), dtype="int8")),
            }
        )

    def v2_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % 17 != 0
        texts = [
            tx[::-1] if i % 13 == 0 else tx
            for i, tx in zip(
                ids[keep], np.array(t.column("text").to_pylist(), object)[keep]
            )
        ]
        fp = _fp64(texts)
        return pa.table(
            {
                "b": pa.array((ids[keep] & (nb - 1)).astype("int32")),
                "doc_id": pa.array(ids[keep].astype("int64")),
                "fp": pa.array(fp),
                "side": pa.array(np.full(int(keep.sum()), 2, dtype="int8")),
            }
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        v1 = g[g["side"] == 1].set_index("doc_id")["fp"]
        v2 = g[g["side"] == 2].set_index("doc_id")["fp"]
        both = v1.index.intersection(v2.index)
        modified = both[(v1.loc[both] != v2.loc[both]).values]
        deleted = v1.index.difference(v2.index)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [modified.to_numpy("int64"), deleted.to_numpy("int64")]
                ),
                "change": ["modified"] * len(modified) + ["deleted"] * len(deleted),
            }
        )

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    return (
        docs.map_batches(v1_rows, batch_format="pyarrow")
        .union(docs.map_batches(v2_rows, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(classify, batch_format="pandas")
        .sort("doc_id")
    )


CORPUS_DIFF_SQL = """
WITH v1 AS (
  SELECT doc_id, md5(text) AS h FROM documents
), v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 13 = 0 THEN reverse(text) ELSE text END) AS h
  FROM documents WHERE doc_id % 17 <> 0
)
SELECT v1.doc_id,
       CASE WHEN v2.doc_id IS NULL THEN 'deleted' ELSE 'modified' END AS change
FROM v1 LEFT JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v2.doc_id IS NULL OR v1.h <> v2.h
ORDER BY v1.doc_id
"""


# -- leakage-safe split: near-dup clusters never straddle train/test ---------

def leakage_safe_split(sf_dir: str) -> "object":
    """GROUP-aware train/val/test split: a document's split is decided by
    the md5 bucket of its near-dup CLUSTER REPRESENTATIVE (min doc_id of
    its MinHash component), not its own id — so a near-duplicate of a
    training document can never land in test (the contamination
    ``dataset_split`` alone cannot prevent; cf. the eval-leakage motivation
    of ``decontaminate``).  Reuses the session-memoized ``dedup_clusters``
    labels; documents and labels co-locate by a doc_id bucket (union +
    bucketed groupby — the empty-partition-safe join idiom), the kernel
    resolves rep-or-self, hashes the rep, and emits (split, n) partials;
    one 3-row groupby folds them.  Output: (split, n_docs)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets
    from .dedup import dedup_clusters

    nb = n_buckets(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )
    docs = _read_docs(sf_dir, ["doc_id"])
    labels = dedup_clusters(sf_dir)

    def doc_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "bk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "rep": pa.array([-1] * t.num_rows, pa.int64()),
                "kind": pa.array([0] * t.num_rows, pa.int8()),
            }
        )

    def label_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "bk": pc.cast(pc.bit_wise_and(ids, nb - 1), pa.int32()),
                "doc_id": ids,
                "rep": pc.cast(t["cluster_rep"], pa.int64()),
                "kind": pa.array([1] * t.num_rows, pa.int8()),
            }
        )

    def assign(g: pd.DataFrame) -> pa.Table:
        reps = g[g["kind"] == 1].set_index("doc_id")["rep"]
        d = g.loc[g["kind"] == 0, ["doc_id"]]
        rep = d["doc_id"].map(reps).fillna(d["doc_id"]).astype("int64")
        b = [
            int(hashlib.md5(str(int(r)).encode()).hexdigest()[:8], 16) % 100
            for r in rep
        ]
        split = pd.Series(
            ["train" if x < 80 else ("val" if x < 90 else "test") for x in b],
            dtype="object",
        )
        part = split.value_counts()
        return pa.table(
            {
                "split": pa.array(part.index.astype(str), pa.string()),
                "n": pa.array(part.values.astype("int64"), pa.int64()),
            }
        )

    out = (
        docs.map_batches(doc_rows, batch_format="pyarrow")
        .union(labels.map_batches(label_rows, batch_format="pyarrow"))
        .groupby("bk")
        .map_groups(assign, batch_format="pandas")
        .groupby("split")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n_docs"))
        .to_pandas()  # 3 rows
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("split").reset_index(drop=True)


def _leakage_safe_split_sql() -> str:
    from .dedup import MINHASH_LSH_SQL

    return f"""
WITH RECURSIVE pairs AS ({MINHASH_LSH_SQL.replace("ORDER BY doc_a, doc_b", "")}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clusters AS (
  SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_rep
  FROM reach GROUP BY a
),
r AS (
  SELECT d.doc_id, COALESCE(c.cluster_rep, d.doc_id) AS rep
  FROM documents d LEFT JOIN clusters c USING (doc_id)
),
bb AS (
  SELECT CAST(concat('0x', substr(md5(CAST(rep AS VARCHAR)), 1, 8))
              AS UBIGINT) % 100 AS b
  FROM r
)
SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
         AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM bb GROUP BY 1 ORDER BY split
"""


LEAKAGE_SAFE_SPLIT_SQL = _leakage_safe_split_sql()


# -- greedy submodular corpus selection (max vocabulary coverage) ---------------

COVER_ROUNDS = 8


def greedy_vocab_cover(sf_dir: str, rounds: int = COVER_ROUNDS) -> "object":
    """Greedy maximum-coverage corpus selection — pick, one at a time, the
    document adding the most NEW vocabulary (Lin & Bilmes-style submodular
    data selection; the greedy is (1−1/e)-optimal for coverage).  The
    round-r selection is a pure function of the corpus, so both engines
    replay it exactly: argmax on new-token count, ties to the smaller
    doc_id.

    Coverage units are word-BIGRAM shingles (the unigram vocabulary of
    the synthetic corpus saturates after one document; bigrams give the
    greedy a real frontier).  Selection stops early when no document adds
    a new shingle — the standard greedy-cover termination, identical on
    both sides.

    Distributed shape: ≤ ``rounds`` streaming passes; each pass folds
    per-doc new-shingle counts EXCLUDING the covered set (broadcast — it
    holds at most the selected docs' union shingles, bounded by
    rounds × doc length, never corpus-sized) map-side to ONE candidate row
    per batch (the batch argmax under the global tie order), so the driver
    reduce reads blocks-count rows.  The oracle is the same greedy
    UNROLLED as chained CTEs (the ``kcore_decompose`` fixed-round
    contract).  Output: (sel_round, doc_id, new_tokens, covered_total).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    from .text import TOKEN_RE

    covered: set[str] = set()
    rows = []
    for r in range(1, rounds + 1):
        cov = covered  # rebind for closure capture (by value via cloudpickle)

        def best_in_batch(t: pa.Table) -> pa.Table:
            best = None  # (-new, doc_id)
            for doc_id, text in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            ):
                ws = TOKEN_RE.findall(text.lower())
                toks = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
                new = len(toks - cov)
                key = (-new, doc_id)
                if best is None or key < best[0]:
                    best = (key, doc_id, new)
            if best is None:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "new": pa.array([], pa.int64())}
                )
            return pa.table(
                {"doc_id": pa.array([best[1]], pa.int64()),
                 "new": pa.array([best[2]], pa.int64())}
            )

        cands = (
            _read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(best_in_batch, batch_format="pyarrow")
            .to_pandas()  # one row per batch
        )
        cands = cands.sort_values(["new", "doc_id"],
                                  ascending=[False, True]).reset_index(drop=True)
        doc_id = int(cands.loc[0, "doc_id"])
        new = int(cands.loc[0, "new"])
        if new == 0:  # coverage exhausted: greedy-cover termination
            break
        # fetch the winner's tokens (predicate-pushdown read of ONE doc)
        import pyarrow.parquet as _pq

        txt = (
            _pq.read_table(
                f"{sf_dir}/documents.parquet", columns=["text"],
                filters=[("doc_id", "==", doc_id)],
            )
            .column("text")[0]
            .as_py()
        )
        ws = TOKEN_RE.findall(txt.lower())
        covered = covered | {f"{a} {b}" for a, b in zip(ws, ws[1:])}
        rows.append(
            {"sel_round": r, "doc_id": doc_id, "new_tokens": new,
             "covered_total": len(covered)}
        )
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in
         ("sel_round", "doc_id", "new_tokens", "covered_total")}
    )


def _greedy_vocab_cover_sql(rounds: int = COVER_ROUNDS) -> str:
    parts = ["""WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
),
tok AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS w
  FROM docs, unnest(generate_series(1, len(ws)-1)) AS t(i)
)"""]
    prev_cov = None
    selects = []
    for r in range(1, rounds + 1):
        if prev_cov is None:
            newcnt = "COUNT(DISTINCT w)"
            where = ""
        else:
            newcnt = "COUNT(DISTINCT w)"
            where = f" WHERE w NOT IN (SELECT w FROM {prev_cov})"
        parts.append(f""",
ch{r} AS (
  SELECT doc_id, {newcnt} AS new_tokens
  FROM tok{where}
  GROUP BY doc_id ORDER BY new_tokens DESC, doc_id LIMIT 1
),
cov{r} AS (
  SELECT DISTINCT w FROM tok
  WHERE doc_id IN ({", ".join(f"(SELECT doc_id FROM ch{i})"
                              for i in range(1, r + 1))})
)""")
        selects.append(
            f"SELECT {r} AS sel_round, doc_id, new_tokens,"
            f" (SELECT COUNT(*) FROM cov{r}) AS covered_total FROM ch{r}"
        )
        prev_cov = f"cov{r}"
    parts.append("\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY sel_round")
    return "".join(parts)


GREEDY_VOCAB_COVER_SQL = _greedy_vocab_cover_sql()


# -- consistent-hashing ring balance -------------------------------------------

N_RING_NODES = 16
RING_POINTS_PER_NODE = 4


def _ring_points() -> list[tuple[int, int]]:
    """(point_hash, node) for N_RING_NODES x RING_POINTS_PER_NODE virtual
    points, md5-derived — deterministic, inlined as literals in the oracle."""
    from .dedup import _hash64

    pts = [
        (_hash64(f"ring:{n}:{v}".encode()), n)
        for n in range(N_RING_NODES)
        for v in range(RING_POINTS_PER_NODE)
    ]
    return sorted(pts)


def hash_ring_balance(sf_dir: str) -> "object":
    """Consistent-hashing balance audit: place every document on the md5
    ring and count per-node load under N_RING_NODES nodes with
    RING_POINTS_PER_NODE virtual points each — the measurement behind this
    engine's own md5-uniform bucketing assumption (and the resharding-cost
    story consistent hashing exists for).  A doc lands on the first ring
    point clockwise from md5_64(doc_id) (wrapping).  Output: (node,
    n_docs) for every node, zero-filled.

    Distributed shape: the ring (64 literals) ships inside the batch
    function; each batch folds to per-node partial counts via one
    vectorized searchsorted, so the exchange is O(nodes)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    pts = _ring_points()
    ring_h = np.array([p[0] for p in pts], dtype=np.uint64)
    ring_n = np.array([p[1] for p in pts], dtype=np.int64)

    ds = _read_docs(sf_dir, ["doc_id"])

    def fold(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[:8], "big"
                )
                for i in ids
            ),
            dtype=np.uint64,
            count=len(ids),
        )
        idx = np.searchsorted(ring_h, hs, side="left")
        idx[idx == len(ring_h)] = 0  # wrap
        nodes = ring_n[idx]
        vals, cnts = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(vals, pa.int64()),
                "n_p": pa.array(cnts, pa.int64()),
            }
        )

    got = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("n_p", alias_name="n_docs"))
        .to_pandas()  # O(nodes)
    )
    full = pd.DataFrame({"node": range(N_RING_NODES)})
    out = full.merge(got, on="node", how="left").fillna(0)
    out["node"] = out["node"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _ring_sql() -> str:
    pts = _ring_points()
    vals = ", ".join(f"({h}::UBIGINT, {n})" for h, n in pts)
    wrap_node = pts[0][1]
    return f"""
WITH ring(h, node) AS (SELECT * FROM (VALUES {vals})),
dh AS (
  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
              AS UBIGINT) AS h
  FROM documents
), assign AS (
  SELECT COALESCE(
           (SELECT r.node FROM ring r WHERE r.h >= dh.h
            ORDER BY r.h LIMIT 1),
           {wrap_node}) AS node
  FROM dh
), counts AS (
  SELECT node, COUNT(*) AS n_docs FROM assign GROUP BY node
)
SELECT n.node, CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs
FROM (SELECT unnest(range({N_RING_NODES})) AS node) n
LEFT JOIN counts c USING (node)
ORDER BY n.node
"""


HASH_RING_BALANCE_SQL = _ring_sql()


# -- Neyman-optimal stratified sampling allocation --------------------------------

NEYMAN_BUDGET = 100


def neyman_allocation(sf_dir: str) -> "object":
    """NEYMAN-optimal stratified sampling allocation over the language
    strata — the variance-minimizing upgrade to proportional
    stratification (``stratified_sample``): stratum h of size N_h with
    doc-length spread sigma_h gets n_h ∝ N_h·sigma_h of the budget.
    The weight is the exact integer w_h = isqrt(N_h·S2_h − S_h²) (the
    cleared variance numerator's isqrt = N_h·sigma_h up to the floor;
    ``math.isqrt``, float-sqrt ±1-corrected in the oracle), and the
    100-doc budget splits by LARGEST REMAINDER: floor shares
    B·w_h // W plus +1 for the L largest fractional parts
    (B·w_h mod W, ties to lang ASC) — the deterministic apportionment
    every survey textbook uses, replayed by the oracle's ROW_NUMBER.
    ONE bounded per-language moment fold.  Output: (lang, n_docs,
    weight_q, alloc)."""
    import math

    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def moments(t: pa.Table) -> pa.Table:
        x = pc.cast(t["n_chars"], pa.int64())
        folded = pa.table(
            {
                "lang": t["lang"],
                "n": pa.array([1] * len(t), pa.int64()),
                "s": x,
                "s2": pc.multiply(x, x),
            }
        )
        return pa.TableGroupBy(folded, "lang").aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]
        )

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_sum", alias_name="n"), Sum("s_sum", alias_name="s"),
                   Sum("s2_sum", alias_name="s2"))
        .to_pandas()  # O(|langs|)
    )
    rows = []
    for r in m.itertuples():
        n, s, s2 = int(r.n), int(r.s), int(r.s2)
        w = math.isqrt(n * s2 - s * s)
        rows.append({"lang": r.lang, "n_docs": n, "weight_q": w})
    W = sum(r["weight_q"] for r in rows)
    B = NEYMAN_BUDGET
    for r in rows:
        r["alloc"] = (B * r["weight_q"]) // W if W else 0
        r["frac"] = (B * r["weight_q"]) % W if W else 0
    leftover = B - sum(r["alloc"] for r in rows)
    order = sorted(rows, key=lambda r: (-r["frac"], r["lang"]))
    for i in range(leftover):
        order[i]["alloc"] += 1
    out = pd.DataFrame(
        sorted(
            [{k: r[k] for k in ("lang", "n_docs", "weight_q", "alloc")}
             for r in rows],
            key=lambda r: r["lang"],
        )
    )
    for c in ("n_docs", "weight_q", "alloc"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


NEYMAN_ALLOCATION_SQL = f"""
WITH m AS (
  SELECT lang, COUNT(*) AS n,
         SUM(CAST(n_chars AS HUGEINT)) AS s,
         SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS s2
  FROM documents GROUP BY lang
), w AS (
  SELECT lang, n,
         (CASE WHEN (t+1)*(t+1) <= v THEN t+1
               WHEN t*t > v THEN t-1
               ELSE t END) AS weight_q
  FROM (
    SELECT lang, n, v, CAST(FLOOR(SQRT(CAST(v AS DOUBLE))) AS HUGEINT) AS t
    FROM (SELECT lang, n, n * s2 - s * s AS v FROM m)
  )
), tot AS (
  SELECT SUM(weight_q) AS W FROM w
), base AS (
  SELECT w.lang, w.n, w.weight_q,
         ({NEYMAN_BUDGET} * w.weight_q) // tot.W AS fl,
         ({NEYMAN_BUDGET} * w.weight_q) % tot.W AS frac
  FROM w, tot
), lo AS (
  SELECT {NEYMAN_BUDGET} - SUM(fl) AS leftover FROM base
), ranked AS (
  SELECT base.*, ROW_NUMBER() OVER (ORDER BY frac DESC, lang) AS rk
  FROM base
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CAST(weight_q AS BIGINT) AS weight_q,
       CAST(fl + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM ranked, lo ORDER BY lang
"""
