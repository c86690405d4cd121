"""Deduplication operators over the ``documents`` table.

Scale pattern per op (ray_guide 'Aggregation at scale' / SURVEY.md):

- exact dedup: content-hash column in a vectorized map_batches, then
  ``groupby(hash).aggregate(Min(doc_id))`` — a single uniform-key shuffle.
- MinHash+LSH near-dup: shingle -> minhash signature per batch -> explode to
  (band_id, band_hash, doc_id) rows -> bucketed bands groupby -> candidate
  pairs -> exact-Jaccard verification via two union + groupby co-location
  rounds (a fully distributed repartition join; no driver hop).
- SimHash: 64-bit signature per document, vectorized per batch.
- n-gram Jaccard: exact all-pairs on a bounded subset (the verification-side
  primitive; LSH is the scale path for candidate generation).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Min

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")


def _read_docs(
    sf_dir: str, columns: list[str], small_aware: bool = True
) -> Dataset:
    from ._util import read_small_aware

    if not small_aware:
        # compute-heavy consumers (quadratic in-bucket verify kernels) keep
        # Ray's default read parallelism — fewer, larger blocks would
        # serialize their signature stage
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=columns
        )
    return read_small_aware(f"{sf_dir}/documents.parquet", columns=columns)


# -- exact dedup ------------------------------------------------------------

def dedup_exact(sf_dir: str) -> Dataset:
    """Keep the minimum doc_id per exact text; returns the kept doc ids with
    their group size (hash-partition + per-group-first, SURVEY graft spec).
    The per-hash fold happens INSIDE a crc32(hash)-bucket kernel — a text
    hash's rows all land in one bucket, so in-bucket min/count IS global —
    keeping aggregate group counts bounded at any corpus size (a direct
    groupby(md5) is corpus-proportional in GROUPS; this Ray build's
    aggregate cost scales with the group count, BASELINE session-5)."""
    import zlib

    import pandas as pd

    nb = _corpus_buckets(sf_dir)

    def hash_text(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        hb = [zlib.crc32(x.encode()) % nb for x in h]
        return pa.table(
            {
                "hb": pa.array(hb, pa.int32()),
                "doc_id": batch.column("doc_id"),
                "h": pa.array(h, pa.string()),
            }
        )

    def bucket_fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("h")["doc_id"].agg(["min", "size"])
        return pa.table(
            {
                "keep_doc_id": pa.array(agg["min"].to_numpy("int64")),
                "group_size": pa.array(agg["size"].to_numpy("int64")),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(hash_text, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(bucket_fold, batch_format="pandas")
    )


DEDUP_EXACT_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS group_size
FROM documents GROUP BY md5(text)
"""


def dedup_prefix(sf_dir: str) -> Dataset:
    """Near-dup-by-key: dedup on the first 3 tokens (a cheap canopy key that
    actually collides on this corpus, exercising group-size > 1)."""

    def key(batch: pa.Table) -> pa.Table:
        ks = [
            " ".join(TOKEN_RE.findall(t.lower())[:3])
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "k": pa.array(ks, pa.string())}
        )

    import zlib

    import pandas as pd

    nb = _corpus_buckets(sf_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        hb = [
            zlib.crc32(k.encode()) % nb for k in t.column("k").to_pylist()
        ]
        return t.append_column("hb", pa.array(hb, pa.int32()))

    def bucket_fold(g: pd.DataFrame) -> pa.Table:
        # per-key fold inside a key-hash bucket: a direct groupby(k) is
        # key-domain-proportional in groups (BASELINE session-5 finding)
        agg = g.groupby("k")["doc_id"].agg(["min", "size"]).reset_index()
        return pa.table(
            {
                "k": pa.array(agg["k"].astype(str), pa.string()),
                "keep_doc_id": pa.array(agg["min"].to_numpy("int64")),
                "group_size": pa.array(agg["size"].to_numpy("int64")),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(key, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(bucket_fold, batch_format="pandas")
    )


DEDUP_PREFIX_SQL = """
SELECT array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+')[1:3], ' ') AS k,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS group_size
FROM documents GROUP BY k
"""


# -- MinHash + LSH ----------------------------------------------------------

N_HASHES = 16
BANDS = 8  # 8 bands x 2 rows: P(candidate) = 1-(1-j^2)^8, ~0.97 at j=0.5
ROWS_PER_BAND = N_HASHES // BANDS
SHINGLE_K = 3
#: Hard cap on an LSH bucket's membership: an adversarially hot band hash
#: (e.g. boilerplate shared by millions of docs) would otherwise produce
#: O(n^2) candidate pairs in one group.  Oversized buckets keep only the
#: `MAX_BUCKET` smallest doc_ids (deterministic) and the dropped-pair count
#: is logged.  Never triggers at test scale.
MAX_BUCKET = 1024


def _corpus_buckets(sf_dir: str) -> int:
    """Coarse co-location bucket count DERIVED from the documents row count
    (parquet metadata only — no scan): groupby keys are hashed into these so
    one map_groups call processes a whole bucket of keys vectorized (pure
    Python per-group calls over tens of thousands of singleton LSH buckets
    cost 10x the useful work), while the derived count keeps one bucket's
    pandas frame bounded at ~``_util.ROWS_PER_BUCKET`` rows at ANY corpus
    scale (a fixed 512 meant corpus/512 rows per task — ~200 GB at 10^12
    docs).  Keys are md5-uniform, so no skew; results are bucket-count
    invariant (tests/test_functions.py)."""
    import pyarrow.parquet as pq

    from ._util import n_buckets

    return n_buckets(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )


def _shingles(text: str) -> set[str]:
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < SHINGLE_K:
        return {" ".join(toks)} if toks else set()
    return {
        " ".join(toks[i : i + SHINGLE_K])
        for i in range(len(toks) - SHINGLE_K + 1)
    }


def _hash64(data: bytes) -> int:
    """First 8 bytes of md5, big-endian — matches DuckDB's
    CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT) exactly, which is
    what makes the whole MinHash pipeline SQL-oracle-checkable."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


#: 16 odd multipliers < 2^63 (so a HUGEINT product never overflows in the
#: DuckDB oracle), derived deterministically from md5 — the multiply-mod-2^64
#: family h_j(x) = (x * M_j) mod 2^64 gives N_HASHES independent-enough
#: min-hashes from ONE md5 per shingle (16x fewer digests than salted md5).
MINHASH_MULTS = tuple(
    (_hash64(f"minhash-mult:{j}".encode()) >> 1) | 1 for j in range(N_HASHES)
)


def _minhash_sig(sh: set[str]) -> list[int]:
    """MinHash signature (Broder, "On the resemblance and containment of
    documents", 1997): per-multiplier minimum of (md5_64(s) * M_j) mod 2^64
    over the shingle set — one md5 per shingle, the 16 derived hashes are a
    wrapping numpy uint64 product (bit-identical to the DuckDB HUGEINT
    arithmetic in the oracle)."""
    import numpy as np

    if not sh:
        return [0] * N_HASHES
    hs = np.fromiter(
        (_hash64(s.encode()) for s in sh), dtype=np.uint64, count=len(sh)
    )
    mults = np.array(MINHASH_MULTS, dtype=np.uint64)
    vals = hs[:, None] * mults[None, :]  # wraps mod 2^64
    return [int(v) for v in vals.min(axis=0)]


class MinHashBands:
    """Actor stage: documents -> (band_id, band_hash, doc_id) rows.

    ``prefix_buckets`` (per-band band-hash-prefix co-location buckets) is
    derived from the corpus size by the caller — see ``_corpus_buckets``."""

    def __init__(self, prefix_buckets: int = 256):
        self.prefix_buckets = prefix_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids, gbs = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = _minhash_sig(_shingles(text))
            for b in range(BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                bh = hashlib.md5((",".join(map(str, chunk))).encode()).hexdigest()
                band_ids.append(b)
                band_hashes.append(bh)
                doc_ids.append(doc_id)
                # coarse pairing-group key: band x hash prefix
                gbs.append(
                    b * self.prefix_buckets
                    + int(bh[:8], 16) % self.prefix_buckets
                )
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "gb": pa.array(gbs, pa.int32()),
            }
        )


class ShingleSets:
    """Actor stage: documents -> (doc_id, RS-joined sorted shingle string)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [
            "\x1e".join(sorted(_shingles(t)))
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pa.array(out, pa.string()),
            }
        )


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5) -> Dataset:
    """Near-duplicate pairs, end-to-end distributed:

    1. banded MinHash rows per doc (one corpus scan);
    2. LSH bucket groupby -> in-bucket candidate pairs (bucket membership
       capped at ``MAX_BUCKET``, dropped pairs logged — skew guard);
    3. exact shingle-Jaccard verification WITHOUT any driver hop, as two
       union + ``groupby(key).map_groups`` co-location rounds (the classic
       repartition join): round A keys pair rows and shingle rows by
       ``doc_a`` and attaches each pair's left shingle set (deduping the
       multi-band candidate multiset in-group); round B keys by ``doc_b``,
       attaches the right set, and runs the Jaccard kernel in-group.

    groupby co-location is used instead of ``Dataset.join`` deliberately:
    the hash-join aggregator crashes on partitions that receive zero rows
    (schemaless empty blocks), which tiny candidate sets routinely produce.

    Returns a Dataset of (doc_a, doc_b, jaccard_permille) sorted by pair.
    Every groupby key is COARSENED to a hash bucket (count DERIVED from the
    corpus row count — ``_corpus_buckets``): the shuffle still co-locates
    exact keys, but one ``map_groups`` call handles a whole bucket of keys
    with vectorized pandas ops inside — per-group Python call overhead
    across tens of thousands of tiny LSH buckets was 10x the useful work
    otherwise.  Keys hash uniformly (md5-derived), so no skew.

    Candidates/pairs never materialize on the driver."""
    import logging

    import pandas as pd

    nb = _corpus_buckets(sf_dir)
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(MinHashBands(nb), batch_format="pyarrow")

    log = logging.getLogger(__name__)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse group = many full LSH buckets; pair within each."""
        out_a: list[int] = []
        out_b: list[int] = []
        for (_bid, _bh), grp in g.groupby(["band_id", "band_hash"]):
            ids = sorted(set(grp["doc_id"]))
            if len(ids) < 2:
                continue
            if len(ids) > MAX_BUCKET:
                dropped = (
                    len(ids) * (len(ids) - 1) - MAX_BUCKET * (MAX_BUCKET - 1)
                ) // 2
                log.warning(
                    "LSH bucket capped: %d members -> %d, ~%d candidate pairs dropped",
                    len(ids), MAX_BUCKET, dropped,
                )
                ids = ids[:MAX_BUCKET]
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
            }
        )

    raw_pairs = bands.groupby("gb").map_groups(
        bucket_pairs, batch_format="pandas"
    )

    shingle_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        ShingleSets(), batch_format="pyarrow"
    )

    # round A: co-locate each pair with doc_a's shingle set.
    # unified schema: (gb, k, other, sh_carry, sh, is_pair) — every stage in
    # this union/groupby chain emits PANDAS blocks (a union of mixed
    # arrow/pandas block types is rejected by the shuffle).
    def pairs_r1(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_a"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (k % nb).astype("int32"),
                "k": k,
                "other": t["doc_b"].astype("int64"),
                "sh_carry": "",
                "sh": "",
                "is_pair": pd.Series([1] * len(t), dtype="int32").values,
            }
        )

    def sh_r1(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (k % nb).astype("int32"),
                "k": k,
                "other": pd.Series([-1] * len(t), dtype="int64").values,
                "sh_carry": "",
                "sh": t["shingles"].values,
                "is_pair": pd.Series([0] * len(t), dtype="int32").values,
            }
        )

    u1 = raw_pairs.map_batches(pairs_r1, batch_format="pandas").union(
        shingle_ds.map_batches(sh_r1, batch_format="pandas")
    )

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per coarse bucket: dedup pairs, map doc_a -> shingle
        string, re-key by doc_b for round B."""
        sh_map = g[g["is_pair"] == 0].set_index("k")["sh"]
        pairs = g[g["is_pair"] == 1][["k", "other"]].drop_duplicates()
        if pairs.empty:
            return pd.DataFrame(
                {
                    "gb": pd.Series(dtype="int32"),
                    "k": pd.Series(dtype="int64"),
                    "other": pd.Series(dtype="int64"),
                    "sh_carry": pd.Series(dtype="object"),
                    "sh": pd.Series(dtype="object"),
                    "is_pair": pd.Series(dtype="int32"),
                }
            )
        sh_a = pairs["k"].map(sh_map).fillna("")
        doc_b = pairs["other"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (doc_b % nb).astype("int32"),
                "k": doc_b,
                "other": pairs["k"].astype("int64").values,
                "sh_carry": sh_a.values,
                "sh": "",
                "is_pair": pd.Series([1] * len(pairs), dtype="int32").values,
            }
        )

    r1 = u1.groupby("gb").map_groups(attach_a, batch_format="pandas")

    # round B: co-locate with doc_b's shingle set and verify in-bucket
    u2 = r1.union(shingle_ds.map_batches(sh_r1, batch_format="pandas"))

    def verify_b(g: pd.DataFrame) -> pd.DataFrame:
        sh_map = g[g["is_pair"] == 0].set_index("k")["sh"]
        pairs = g[g["is_pair"] == 1]
        out_a, out_b, out_j = [], [], []
        for doc_b, doc_a, sh_a_raw in zip(
            pairs["k"], pairs["other"], pairs["sh_carry"]
        ):
            sh_b_raw = sh_map.get(doc_b, "")
            A = set(sh_a_raw.split("\x1e")) if sh_a_raw else set()
            B = set(sh_b_raw.split("\x1e")) if sh_b_raw else set()
            inter = len(A & B)
            union = len(A) + len(B) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(int(doc_a))
                out_b.append(int(doc_b))
                out_j.append(int(j * 1000))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "jaccard_permille": pd.Series(out_j, dtype="int64"),
            }
        )

    # no final sort: it would be a 4th all-to-all (~2s fixed stage latency)
    # purely for cosmetics — the row SET is deterministic, and both the
    # correctness harness and downstream groupbys are order-insensitive
    return u2.groupby("gb").map_groups(verify_b, batch_format="pandas")


# DuckDB mirror of the full MinHash+LSH pipeline (possible because the hash
# is md5-based): shingle sets -> one 64-bit md5 per shingle -> 16
# multiply-mod-2^64 min-hashes (HUGEINT arithmetic = numpy uint64 wrap) ->
# 8 banded md5 bucket keys -> in-bucket pairs -> exact-Jaccard verification.
_MULT_VALUES = ", ".join(
    f"({j}, {m})" for j, m in enumerate(MINHASH_MULTS)
)
#: shared CTE prefix (shingles -> md5 min-hashes -> bands -> candidate
#: pairs) — MINHASH_LSH_SQL verifies/filters on top of it, the calibration
#: audit bins estimator-vs-exact on top of the SAME candidates.
_MINHASH_BASE_CTES = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 3 + 2),
                                 i -> array_to_string(toks[i:i+2], ' ')))
         END AS shingles
  FROM t
), sv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), hs AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT) AS h
  FROM sv
), hv AS (
  SELECT doc_id, m.salt,
         MIN(CAST((CAST(h AS HUGEINT) * m.mult) % 18446744073709551616
                  AS UBIGINT)) AS m
  FROM hs CROSS JOIN (VALUES {_MULT_VALUES}) m(salt, mult)
  GROUP BY doc_id, m.salt
), sig AS (""" + """
  SELECT d.doc_id, salt.salt, COALESCE(hv.m, 0) AS m
  FROM documents d CROSS JOIN (SELECT unnest(range(16)) AS salt) salt
  LEFT JOIN hv ON hv.doc_id = d.doc_id AND hv.salt = salt.salt
), bands AS (
  SELECT doc_id, CAST(salt // 2 AS INTEGER) AS band_id,
         md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY salt)) AS band_hash
  FROM sig GROUP BY doc_id, salt // 2
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)"""

MINHASH_LSH_SQL = _MINHASH_BASE_CTES + """, j AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
           / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jac
  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b
  WHERE len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) > 0
)
SELECT doc_a, doc_b, CAST(FLOOR(jac * 1000) AS BIGINT) AS jaccard_permille
FROM j WHERE jac >= 0.5 ORDER BY doc_a, doc_b
"""


def label_components(
    pairs: Dataset, col_a: str, col_b: str, max_iters: int = 25
) -> Dataset:
    """Generic connected components over a symmetric pair Dataset by
    alternating large-star / small-star edge rewrites (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014).  Each round
    is ONE bucketed groupby over the edge set — vs the r2 min-label
    propagation's two shuffles + a label union + a driver sum per round —
    and the alternation converges in O(log^2 n) rounds (a handful on real
    dup graphs) vs O(diameter):

    - large-star(u): with m = min(neighbors(u) + [u]), rewrite every edge
      to a LARGER neighbor v > u as (v, m);
    - small-star(u): with N = neighbors(u) <= u and m = min(N), rewrite the
      group to (u, m) + (v, m) for v in N - [m].

    Both rewrites strictly lower the endpoint of every changed edge, so the
    edge set monotonically contracts onto per-component stars rooted at the
    component minimum.  Every directed copy of an edge lands in the same
    u-bucket, so the kernel's drop_duplicates is a GLOBAL dedup per round.
    Fixpoint = a full large+small alternation with zero rewrites, counted
    exactly in-kernel and carried out-of-band in per-bucket sentinel rows
    (a = -1) whose ``chg`` sum is the only driver-side value per round.
    Bucket count derives from the edge count (``n_buckets``), not a fixed
    constant.  Returns (node, lbl) for every node in at least one pair;
    lbl = min node of the component.  Shared by the MinHash doc clusters
    and the embedding-cosine vector clusters."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Min

    from ._util import ROWS_PER_BUCKET, n_buckets

    pairs = pairs.materialize()
    n_pairs = pairs.count()

    if n_pairs <= ROWS_PER_BUCKET:
        # Size-adaptive escape: the star loop pays ~2 s of fixed stage
        # latency per half-round regardless of edge count (measured 16 s
        # for 256 edges at sf0.1/32 CPUs), so an edge set that fits ONE
        # co-location bucket's budget is labeled on the driver in a single
        # vectorized union-find pass instead of ~8 all-to-alls.  The bound
        # is the same fixed per-task budget every bucketed kernel already
        # assumes; above it the distributed alternation below is the path.
        import ray.data as _rd

        df = pairs.to_pandas()
        if len(df) == 0:
            return _rd.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype="int64"),
                              "lbl": pd.Series([], dtype="int64")})
            )
        a = df[col_a].astype("int64").to_numpy()
        b = df[col_b].astype("int64").to_numpy()
        nodes, idx = np.unique(np.concatenate([a, b]), return_inverse=True)
        parent = np.arange(len(nodes))
        ia, ib = idx[: len(a)], idx[len(a):]

        def find(p: np.ndarray, i: int) -> int:
            while p[i] != i:
                p[i] = p[p[i]]  # path halving
                i = p[i]
            return i

        for x, y in zip(ia, ib):
            rx, ry = find(parent, int(x)), find(parent, int(y))
            if rx != ry:
                # union by smaller ORIGINAL node id, so the root IS the
                # component minimum (nodes[] is sorted by np.unique)
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        roots = np.array([find(parent, i) for i in range(len(nodes))])
        out = pd.DataFrame(
            {"node": nodes.astype("int64"), "lbl": nodes[roots].astype("int64")}
        )
        return _rd.from_pandas(out)

    nb = n_buckets(2 * n_pairs)

    # Every block SHIPPED between stages here is ARROW: a pandas block is
    # ~13x slower through the sort/shuffle machinery (measured on the
    # simhash dedup aggregate, see bucket_pairs) — the kernels still use
    # pandas/numpy internally where that is the vectorized tool.

    def _edge_table(a: "np.ndarray", b: "np.ndarray", chg: int) -> pa.Table:
        # appends the per-kernel sentinel row (a = -1) carrying `chg`
        return pa.table(
            {
                "a": pa.array(np.concatenate([a, [-1]]).astype("int64")),
                "b": pa.array(np.concatenate([b, [-1]]).astype("int64")),
                "chg": pa.array(
                    np.concatenate(
                        [np.zeros(len(a), dtype="int64"), [chg]]
                    )
                ),
            }
        )

    def to_canonical(t: pa.Table) -> pa.Table:
        a = np.asarray(t[col_a], dtype="int64")
        b = np.asarray(t[col_b], dtype="int64")
        hi, lo = np.maximum(a, b), np.minimum(a, b)
        keep = hi != lo
        hi, lo = hi[keep], lo[keep]
        uniq = np.unique(np.stack([hi, lo], axis=1), axis=0)
        return pa.table(
            {
                "a": pa.array(uniq[:, 0]),
                "b": pa.array(uniq[:, 1]),
                "chg": pa.array(np.zeros(len(uniq), dtype="int64")),
            }
        )

    edges = pairs.map_batches(to_canonical, batch_format="pyarrow").materialize()

    def large_dirs(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], dtype="int64")
        b = np.asarray(t["b"], dtype="int64")
        keep = a >= 0  # drop prior-round sentinels
        a, b = a[keep], b[keep]
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table(
            {
                "gb": pa.array((u % nb).astype("int32")),
                "u": pa.array(u),
                "v": pa.array(v),
            }
        )

    def large_star(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["u", "v"])  # global dedup (all copies co-bucket)
        mn = g.groupby("u")["v"].min()
        m = pd.Series(np.minimum(mn.values, mn.index.values), index=mn.index)
        sel = g[g["v"] > g["u"]]
        new_b = sel["u"].map(m).astype("int64")
        out = pd.DataFrame(
            {"a": sel["v"].astype("int64").values, "b": new_b.values}
        ).drop_duplicates(["a", "b"])
        return _edge_table(
            out["a"].to_numpy(), out["b"].to_numpy(),
            int((new_b.values != sel["u"].values).sum()),
        )

    def small_dirs(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], dtype="int64")
        b = np.asarray(t["b"], dtype="int64")
        keep = a >= 0
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "gb": pa.array((a % nb).astype("int32")),
                "u": pa.array(a),
                "v": pa.array(b),
            }
        )

    def small_star(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["u", "v"])
        mn = g.groupby("u")["v"].min()
        m_of = g["u"].map(mn).astype("int64")
        leaves = g[g["v"].values != m_of.values]  # (v, m) for v in N - [m]
        out = pd.concat(
            [pd.DataFrame({"a": leaves["v"].astype("int64").values,
                           "b": m_of[leaves.index].values}),
             pd.DataFrame({"a": mn.index.astype("int64"), "b": mn.values})],
            ignore_index=True,
        ).drop_duplicates(["a", "b"])
        return _edge_table(
            out["a"].to_numpy(), out["b"].to_numpy(), int(len(leaves))
        )

    for _ in range(max_iters):
        edges = (
            edges.map_batches(large_dirs, batch_format="pyarrow")
            .groupby("gb")
            .map_groups(large_star, batch_format="pandas")
            .materialize()
        )
        chg_l = edges.sum("chg") or 0  # None on an empty edge set
        edges = (
            edges.map_batches(small_dirs, batch_format="pyarrow")
            .groupby("gb")
            .map_groups(small_star, batch_format="pandas")
            .materialize()
        )
        chg_s = edges.sum("chg") or 0
        if not chg_l and not chg_s:  # full alternation with zero rewrites
            break

    def star_labels(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], dtype="int64")
        b = np.asarray(t["b"], dtype="int64")
        keep = a >= 0
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "lbl": pa.array(np.concatenate([b, b])),
            }
        )

    return (
        edges.map_batches(star_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lbl", alias_name="lbl"))
    )


#: session memo (Ray-job keyed, the similarity._KNN_MEMO pattern):
#: dedup_keep_list consumes dedup_clusters, so a back-to-back harness run
#: would otherwise pay the pair-generation + CC iteration twice.
_CLUSTERS_MEMO: dict[tuple, tuple[str, Dataset]] = {}


def dedup_clusters(sf_dir: str, max_iters: int = 25) -> Dataset:
    """Duplicate-cluster assignment: connected components of the MinHash
    near-dup graph (see ``label_components`` for the propagation
    construction).  Output: (doc_id, cluster_rep) for every document in at
    least one near-dup pair; cluster_rep = min doc_id of the component (the
    canonical keeper).  Memoized (materialized) per sf_dir + Ray session."""
    import pandas as pd

    import ray

    from ._util import session_token

    tok = session_token()
    memo_key = (sf_dir, max_iters)
    hit = _CLUSTERS_MEMO.get(memo_key)
    if hit is not None and hit[0] == tok:
        return hit[1]

    # the LSH-pruned pair set is the small side; materialize once so the
    # iteration doesn't re-run shingling+banding per round
    labels = label_components(minhash_lsh_pairs(sf_dir), "doc_a", "doc_b", max_iters)

    def shape(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": t["node"].astype("int64"),
                "cluster_rep": t["lbl"].astype("int64"),
            }
        )

    out = labels.map_batches(shape, batch_format="pandas").materialize()
    _CLUSTERS_MEMO[memo_key] = (tok, out)
    return out



# recursive-CTE mirror: transitive closure over the (symmetric) near-dup
# edge set, component rep = min reachable node (incl. self)
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({MINHASH_LSH_SQL.replace("ORDER BY doc_a, doc_b", "")}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_rep
FROM reach GROUP BY a ORDER BY doc_id
"""


def dedup_keep_list(sf_dir: str) -> Dataset:
    """The end-to-end corpus dedup decision — the keep-list a training-data
    pipeline actually consumes: a document survives unless it is (a) an
    exact duplicate of a lower doc_id (md5 text hash) or (b) a member of a
    MinHash near-dup cluster without being the cluster's rep (min doc_id).

    Composition of ``dedup_exact`` semantics + ``dedup_clusters``; the final
    fold is one bucketed co-location of (all docs, exact-drop markers,
    near-drop markers).  Returns (doc_id) rows."""
    import pandas as pd

    nb = _corpus_buckets(sf_dir)

    # exact-dup DROPS: per md5(text) group, everything above the min doc_id
    def hash_rows(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        hb = [int(x[:2], 16) for x in h]  # coarse hash-prefix bucket
        return pa.table(
            {
                "hb": pa.array(hb, pa.int32()),
                "h": pa.array(h, pa.string()),
                "doc_id": batch.column("doc_id"),
            }
        )

    def exact_drops(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby("h")["doc_id"].transform("min")
        d = g[g["doc_id"] != keep]
        return pd.DataFrame({"doc_id": d["doc_id"].astype("int64")})

    ex_drop = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(hash_rows, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(exact_drops, batch_format="pandas")
    )

    # near-dup DROPS: cluster members that are not the rep
    def near_drops(t: pd.DataFrame) -> pd.DataFrame:
        d = t[t["doc_id"] != t["cluster_rep"]]
        return pd.DataFrame({"doc_id": d["doc_id"].astype("int64")})

    nd_drop = dedup_clusters(sf_dir).map_batches(
        near_drops, batch_format="pandas"
    )

    # final fold: all docs minus both drop sets (bucketed co-location)
    def all_docs(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (k % nb).astype("int32"),
                "doc_id": k,
                "is_drop": pd.Series([0] * len(t), dtype="int32").values,
            }
        )

    def drop_rows(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (k % nb).astype("int32"),
                "doc_id": k,
                "is_drop": pd.Series([1] * len(t), dtype="int32").values,
            }
        )

    u = (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(all_docs, batch_format="pandas")
        .union(ex_drop.map_batches(drop_rows, batch_format="pandas"))
        .union(nd_drop.map_batches(drop_rows, batch_format="pandas"))
    )

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        dropped = set(g[g["is_drop"] == 1]["doc_id"])
        keep = g[(g["is_drop"] == 0) & ~g["doc_id"].isin(dropped)]
        return pd.DataFrame({"doc_id": keep["doc_id"].astype("int64")})

    return u.groupby("gb").map_groups(survivors, batch_format="pandas")


DEDUP_KEEP_LIST_SQL = f"""
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
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_rep FROM reach GROUP BY a
),
exact_drop AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
    FROM documents
  ) WHERE doc_id != keep
),
near_drop AS (SELECT doc_id FROM clusters WHERE doc_id != cluster_rep)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM exact_drop)
  AND doc_id NOT IN (SELECT doc_id FROM near_drop)
ORDER BY doc_id
"""


# -- C4/CCNet line-level dedup with rewrite ---------------------------------

#: tokens per pseudo-line.  The corpus text carries no newlines, so the
#: line unit of C4/CCNet line-dedup is stood in for by non-overlapping
#: 8-token windows (the last window may be shorter); the machinery is
#: identical for real newline-delimited text — only this splitter changes.
LINE_UNIT_W = 8


def _doc_units(text: str) -> list[str]:
    toks = TOKEN_RE.findall(text.lower())
    return [
        " ".join(toks[i : i + LINE_UNIT_W])
        for i in range(0, len(toks), LINE_UNIT_W)
    ]


def line_dedup(sf_dir: str) -> Dataset:
    """C4/CCNet-style duplicated-line REMOVAL — the rewrite stage that
    ``dup_chunks`` (worklist) and ``substring_dup_coverage`` (stats) stop
    short of (C4: Raffel et al., JMLR 2020 §2.2 "three-sentence span"
    dedup; CCNet: Wenzek et al., LREC 2020 per-shard line dedup).  A
    document keeps a pseudo-line unit iff it is the unit's KEEPER (the
    minimum doc_id containing it); every other document drops all its
    occurrences.  Output one row per document: unit count, dropped count,
    and the md5 of the kept units re-joined in original order — the
    residual-text hash makes the full rewrite comparable to the oracle
    without shipping rewritten text to the driver.

    Distributed shape (100 TB): two md5-uniform bucketed exchanges, both
    with derived bucket counts (``_util.n_buckets``) so per-task frames
    stay bounded at any corpus size.  Pass 1 ships only (bucket, unit-md5,
    doc_id) distinct pairs; the in-bucket fold computes the global keeper
    (all rows of a unit hash co-locate) and forwards drop pairs — rows
    proportional to the DUPLICATED unit count, not the corpus.  Pass 2
    co-locates each doc's text with its drop pairs by doc-id bucket (the
    one exchange the rewrite inherently needs — a broadcast of the drop
    set would be corpus-proportional driver state) and rewrites in-kernel.
    No driver-side state at all; reference analogue: none (beyond-reference
    training-data op)."""
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets

    # unit rows ~ 1 per LINE_UNIT_W tokens; docs avg ~10 units at this shape
    nbh = n_buckets(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * 8
    )
    nbd = _corpus_buckets(sf_dir)

    def unit_rows(t: pa.Table) -> pa.Table:
        hbs, hs, ids = [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            seen: set[str] = set()
            for u in _doc_units(text):
                h = hashlib.md5(u.encode()).hexdigest()
                if h in seen:
                    continue  # (doc, unit) decision is per-pair: one row
                seen.add(h)
                hbs.append(zlib.crc32(h.encode()) % nbh)
                hs.append(h)
                ids.append(doc_id)
        return pa.table(
            {
                "hb": pa.array(hbs, pa.int32()),
                "h": pa.array(hs, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    def drop_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a unit hash are in this bucket: in-bucket min IS the
        # global keeper; non-keeper (doc, unit) pairs forward as drops
        keeper = g.groupby("h")["doc_id"].transform("min")
        d = g[g["doc_id"] != keeper]
        k = d["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "db": (k % nbd).astype("int32"),
                "doc_id": k,
                "h": d["h"].astype(str),
                "text": pd.Series([""] * len(d), dtype=str).values,
                "role": pd.Series([1] * len(d), dtype="int32").values,
            }
        )

    drops = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(unit_rows, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(drop_pairs, batch_format="pandas")
    )

    def doc_rows(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "db": (k % nbd).astype("int32"),
                "doc_id": k,
                "h": pd.Series([""] * len(t), dtype=str).values,
                "text": t["text"].astype(str),
                "role": pd.Series([0] * len(t), dtype="int32").values,
            }
        )

    u = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(doc_rows, batch_format="pandas")
        .union(drops)
    )

    def rewrite(g: pd.DataFrame) -> pa.Table:
        dr = g[g["role"] == 1]
        dropset: dict[int, set[str]] = {
            int(doc): set(sub["h"])
            for doc, sub in dr.groupby("doc_id")
        }
        ids, n_units, n_dropped, md5s = [], [], [], []
        docs = g[g["role"] == 0]
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            units = _doc_units(text)
            bad = dropset.get(int(doc_id), ())
            kept = [
                x
                for x in units
                if not bad or hashlib.md5(x.encode()).hexdigest() not in bad
            ]
            ids.append(int(doc_id))
            n_units.append(len(units))
            n_dropped.append(len(units) - len(kept))
            md5s.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_units": pa.array(n_units, pa.int64()),
                "n_dropped": pa.array(n_dropped, pa.int64()),
                "residual_md5": pa.array(md5s, pa.string()),
            }
        )

    return u.groupby("db").map_groups(rewrite, batch_format="pandas")


LINE_DEDUP_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
),
units AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS unit_idx,
         array_to_string(list_slice(ws, u.i*8+1, u.i*8+8), ' ') AS unit
  FROM toks, LATERAL (SELECT unnest(range((len(ws)+7)//8)) AS i) u
),
keep AS (SELECT unit, MIN(doc_id) AS keeper FROM units GROUP BY unit),
agg AS (
  SELECT u.doc_id,
         COUNT(*) AS n_units,
         SUM(CASE WHEN u.doc_id <> k.keeper THEN 1 ELSE 0 END) AS n_dropped,
         md5(COALESCE(string_agg(
             CASE WHEN u.doc_id = k.keeper THEN u.unit END, ' '
             ORDER BY u.unit_idx), '')) AS residual_md5
  FROM units u JOIN keep k USING (unit)
  GROUP BY u.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_units, 0) AS BIGINT) AS n_units,
       CAST(COALESCE(a.n_dropped, 0) AS BIGINT) AS n_dropped,
       COALESCE(a.residual_md5, md5('')) AS residual_md5
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


# -- SimHash ----------------------------------------------------------------

class SimHash64:
    """64-bit SimHash per document (Charikar, "Similarity estimation
    techniques from rounding algorithms", STOC 2002): sign of the
    weighted sum of per-token hash bits.  Actor stage with a token->hash
    cache (vocabulary is Zipfian, so most md5s are cache hits); the per-bit
    accumulate is a numpy matrix op, not a 64x-tokens Python loop."""

    def __init__(self):
        import numpy as np

        self._np = np
        self.token_re = re.compile(r"[A-Za-z0-9_]+")
        self.hash_cache: dict[str, int] = {}
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def _tok_hash(self, tok: str) -> int:
        h = self.hash_cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            self.hash_cache[tok] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        np = self._np
        from collections import Counter

        out = []
        for text in batch.column("text").to_pylist():
            counts = Counter(self.token_re.findall(text.lower()))
            if not counts:
                out.append(0)
                continue
            hs = np.fromiter(
                (self._tok_hash(t) for t in counts), dtype=np.uint64,
                count=len(counts),
            )
            ws = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            # (n_tok, 64) sign matrix in {-1, +1}, weighted column sums
            bits = ((hs[:, None] >> self.bit_idx) & np.uint64(1)).astype(np.int64)
            acc = ((2 * bits - 1) * ws[:, None]).sum(axis=0)
            v = int(((acc > 0).astype(np.uint64) << self.bit_idx).sum())
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "simhash": pa.array(out, pa.int64())}
        )


def simhash64(sf_dir: str) -> Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHash64, batch_format="pyarrow", concurrency=(1, 8)
    )


# DuckDB mirror: per-token 64-bit md5 hash, per-bit weighted sign sum,
# HUGEINT bit assembly, two's-complement fold into signed int64.
SIMHASH64_SQL = """
WITH tok AS (
  SELECT doc_id, tok, COUNT(*) AS w FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
    FROM documents
  ) GROUP BY doc_id, tok
), h AS (
  SELECT doc_id, w,
         CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS hv
  FROM tok
), bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (hv >> b.bit) & 1 = 1 THEN w ELSE -w END) AS acc
  FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
  GROUP BY doc_id, b.bit
), vals AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0 THEN CAST(1 AS HUGEINT) << CAST(bit AS INTEGER)
             ELSE 0 END) AS v
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(CASE WHEN v >= CAST(1 AS HUGEINT) << 63
                          THEN v - (CAST(1 AS HUGEINT) << 64) ELSE v END,
                     0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN vals USING (doc_id) ORDER BY d.doc_id
"""


SIMHASH_PAIR_BANDS = 9  # pigeonhole: hamming <= 8 => >= 1 of 9 bands equal


def simhash_pairs(sf_dir: str, max_hamming: int = 8) -> Dataset:
    """SimHash near-dup pairs with EXACT recall, sub-quadratically: split
    the 64-bit signature into ``SIMHASH_PAIR_BANDS`` disjoint bands — by
    pigeonhole, any pair within ``max_hamming`` = bands-1 bits agrees on at
    least one whole band — group by (band, band value), verify the true
    Hamming distance in-bucket from the carried signatures (no join-back),
    and dedupe pairs found via several bands with one aggregate.  Unlike
    probabilistic LSH this misses NOTHING, so it shares an exact SQL
    oracle.  Output: (doc_a, doc_b, hamming)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Min

    # band bit layout: band 0 = bits 0-7 (8 bits), bands 1..8 = 7 bits each
    widths = [8] + [7] * 8
    offsets = np.cumsum([0] + widths[:-1]).tolist()

    nb = _corpus_buckets(sf_dir)
    sig = simhash64(sf_dir)

    def band_rows(t: pa.Table) -> pa.Table:
        # consumes AND emits ARROW: a pandas-INPUT map_batches feeding the
        # gb sort measured 16s vs 6s for the identical arrow-input stage
        # (per-block pandas conversion upstream of the shuffle), on top of
        # the 13x pandas-block sort penalty the bucket_pairs note covers
        h = t["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        sh = t["simhash"].to_numpy().astype(np.int64)
        k = len(widths)
        n = len(ids)
        gb = np.empty(k * n, dtype=np.int32)
        band = np.empty(k * n, dtype=np.int32)
        vals = np.empty(k * n, dtype=np.int64)
        for b, (off, w) in enumerate(zip(offsets, widths)):
            val = ((h >> np.uint64(off)) & np.uint64((1 << w) - 1)).astype(
                np.int64
            )
            sl = slice(b * n, (b + 1) * n)
            gb[sl] = (b * 257 + val) % nb
            band[sl] = b
            vals[sl] = val
        return pa.table(
            {
                "gb": pa.array(gb),
                "band": pa.array(band),
                "val": pa.array(vals),
                "doc_id": pa.array(np.tile(ids, k)),
                "simhash": pa.array(np.tile(sh, k)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # NO MAX_BUCKET truncation here (found as an sf0.1 regression: a
        # hot band silently dropped 89 true pairs): this op's contract is
        # EXACT recall with an exact SQL oracle, so a hot band must pay its
        # quadratic comparison cost — dropping is an approximation knob
        # that belongs to the probabilistic MinHash path (where the oracle
        # models the cap), never to an exact one.  The inner loop is fully
        # vectorized (bytewise-LUT popcount over one xor row per anchor),
        # so a 10k-member band costs ~50M vector popcounts, not Python.
        out_a, out_b, out_h = [], [], []
        for (_b, _v), grp in g.groupby(["band", "val"]):
            if len(grp) < 2:
                continue
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            hs = np.asarray(grp["simhash"], dtype=np.int64).view(np.uint64)
            n = len(ids)
            # |x xor y| = |x| + |y| - 2*(x.y) over the 64-bit vectors: one
            # float32 matmul per 512-anchor block replaces the per-anchor
            # Python loop (a hot band is inherently quadratic — make every
            # flop a BLAS flop)
            bits = np.unpackbits(hs.view(np.uint8).reshape(n, 8), axis=1)
            B = bits.astype(np.float32)
            pop = B.sum(axis=1)
            for s in range(0, n, 512):
                e = min(s + 512, n)
                ham = (
                    pop[s:e, None] + pop[None, :] - 2.0 * (B[s:e] @ B.T)
                ).astype(np.int64)
                ii, jj = np.nonzero(ham <= max_hamming)
                keep = jj > ii + s  # upper triangle only
                ii, jj = ii[keep], jj[keep]
                out_a.extend(ids[ii + s].tolist())
                out_b.extend(ids[jj].tolist())
                out_h.extend(ham[ii, jj].tolist())
        # pair key FUSED to one int64 (doc ids < 2^31) and emitted as an
        # ARROW block: a pandas-block groupby().aggregate() is ~13x slower
        # than the arrow-block path (measured 13.4 s vs 1.0 s on the same
        # 160k rows) — the kernel consumes pandas, but what it SHIPS into
        # the dedup shuffle is arrow
        a = np.asarray(out_a, dtype=np.int64)
        b = np.asarray(out_b, dtype=np.int64)
        return pa.table(
            {
                "pk": pa.array((a << np.int64(32)) | b, pa.int64()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    import pyarrow.compute as pc

    def decode(t: pa.Table) -> pa.Table:
        pk = t["pk"]
        return pa.table(
            {
                "doc_a": pc.shift_right(pk, 32),
                "doc_b": pc.bit_wise_and(pk, 0xFFFFFFFF),
                "hamming": pc.cast(t["hamming"], pa.int64()),
            }
        )

    def key_pk(t: pa.Table) -> pa.Table:
        import numpy as np

        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pb",
            pa.array((pk & (nb - 1)).astype(np.int32)),
        )

    def min_fold(g: "object") -> pa.Table:
        # cross-band pair dedup inside a pair-hash bucket: a direct
        # groupby(pk) is output-proportional in groups (BASELINE
        # session-5 group-count finding)
        agg = g.groupby("pk", as_index=False)["hamming"].min()
        return pa.table(
            {
                "pk": pa.array(agg["pk"].to_numpy("int64")),
                "hamming": pa.array(agg["hamming"].to_numpy("int64")),
            }
        )

    return (
        sig.map_batches(band_rows, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(key_pk, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(min_fold, batch_format="pandas")
        .map_batches(decode, batch_format="pyarrow")
    )


SIMHASH_PAIRS_SQL = f"""
WITH s AS ({SIMHASH64_SQL.replace("ORDER BY d.doc_id", "")})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
ORDER BY doc_a, doc_b
"""


# -- exact word-set Jaccard pairs (bounded subset, SQL-checkable) -----------

def word_jaccard_pairs(sf_dir: str, max_doc_id: int = 120, threshold: float = 0.5):
    """All-pairs distinct-word Jaccard >= threshold over doc_id < max_doc_id.
    The subset is broadcast once (``ray.put``) and pair scoring fans out by
    left-doc over a range dataset — exact small-side verification primitive.
    """
    import pandas as pd

    sub = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .filter(expr=f"doc_id < {max_doc_id}")
        .to_pandas()
    )
    sub = sub.sort_values("doc_id").reset_index(drop=True)
    wordsets = {
        int(r.doc_id): frozenset(TOKEN_RE.findall(r.text.lower()))
        for r in sub.itertuples()
    }
    ref = ray.put(wordsets)
    ids = sorted(wordsets)

    def pairs_for(batch: pa.Table) -> pa.Table:
        ws = ray.get(ref)
        all_ids = sorted(ws)
        out_a, out_b, out_j = [], [], []
        for a in batch.column("id").to_pylist():
            da = all_ids[a]
            A = ws[da]
            for db in all_ids[a + 1 :]:
                B = ws[db]
                inter = len(A & B)
                union = len(A) + len(B) - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    out_a.append(da)
                    out_b.append(db)
                    out_j.append(int(j * 1000 // 1))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard_permille": pa.array(out_j, pa.int64()),
            }
        )

    out = (
        ray.data.range(len(ids))
        .map_batches(pairs_for, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


WORD_JACCARD_SQL = """
WITH s AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
  FROM documents WHERE doc_id < 120
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(FLOOR(len(list_intersect(a.w, b.w))::DOUBLE
            / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) * 1000) AS BIGINT)
         AS jaccard_permille
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.w, b.w))::DOUBLE
      / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.5
ORDER BY doc_a, doc_b
"""


# -- distributed n-gram Jaccard via inverted index ---------------------------

def ngram_jaccard_pairs(
    sf_dir: str,
    threshold_permille: int = 200,
    max_df: int | None = None,
) -> Dataset:
    """All-pairs word-trigram Jaccard >= threshold over the WHOLE corpus —
    the scale path that ``word_jaccard_pairs`` (bounded broadcast subset)
    is the verification primitive for.  Inverted-index shape: shingle rows
    fan out of each doc once, co-locate by a crc32 shingle bucket, and each
    in-bucket kernel emits pre-summed candidate-pair partials — only docs
    that SHARE a shingle ever meet, so the pair space is sparse, never
    O(n^2).  Intersection sums and the two per-doc shingle counts then
    attach through the union + bucketed-groupby co-location join (the
    ``minhash_lsh_pairs`` round-A/B shape; ``Dataset.join`` would crash on
    sparse partitions), with every carried value a scalar int — no set or
    string payloads cross the shuffle.  All arithmetic is integer-exact
    (inter*1000 >= t*union; permille = inter*1000 // union) so the result
    hash-matches NGRAM_JACCARD_SQL.

    ``max_df`` (production knob, default off so the oracle stays exact):
    shingle groups seen in more than ``max_df`` docs are stop-shingles —
    they contribute O(df^2) pairs — and are dropped WITH a logged count,
    the same honesty contract as the MinHash ``MAX_BUCKET`` skew cap.
    Three all-to-alls total; bucket counts derive from corpus size."""
    import zlib

    import pandas as pd

    nb = _corpus_buckets(sf_dir)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def shingle_rows(t: pa.Table) -> pd.DataFrame:
        gbs, shs, ids = [], [], []
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            if len(toks) < SHINGLE_K:
                continue
            for i in range(len(toks) - SHINGLE_K + 1):
                sh = " ".join(toks[i : i + SHINGLE_K])
                gbs.append(zlib.crc32(sh.encode()) % nb)
                shs.append(sh)
                ids.append(did)
        df = pd.DataFrame(
            {
                "gb": pd.Series(gbs, dtype="int32"),
                "sh": pd.Series(shs, dtype="object"),
                "doc_id": pd.Series(ids, dtype="int64"),
            }
        )
        return df.drop_duplicates()  # distinct within doc (and batch)

    shingles = docs.map_batches(shingle_rows, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Per shingle bucket: distinct (sh, doc), group by shingle, emit
        every sorted doc pair with an in-kernel pre-sum — rows leaving the
        kernel are (pair, partial_count), one per distinct pair per bucket."""
        g = g[["sh", "doc_id"]].drop_duplicates()
        sizes = g.groupby("sh")["doc_id"].transform("size")
        if max_df is not None:
            dropped = g[sizes > max_df]
            if len(dropped):
                print(
                    f"ngram_jaccard: dropping {dropped['sh'].nunique()} "
                    f"stop-shingles (df > {max_df})"
                )
            g = g[sizes <= max_df]
            sizes = sizes[sizes <= max_df]
        g = g[sizes > 1]
        out_a, out_b = [], []
        for _, grp in g.groupby("sh", sort=False):
            ids = sorted(grp["doc_id"].tolist())
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    out_a.append(ids[x])
                    out_b.append(ids[y])
        if not out_a:
            return pd.DataFrame(
                {
                    "gb": pd.Series(dtype="int32"),
                    "k": pd.Series(dtype="int64"),
                    "other": pd.Series(dtype="int64"),
                    "val": pd.Series(dtype="int64"),
                    "carry": pd.Series(dtype="int64"),
                    "is_pair": pd.Series(dtype="int32"),
                }
            )
        p = (
            pd.DataFrame({"k": out_a, "other": out_b})
            .value_counts()
            .reset_index(name="val")
        )
        return pd.DataFrame(
            {
                "gb": (p["k"] % nb).astype("int32"),
                "k": p["k"].astype("int64"),
                "other": p["other"].astype("int64"),
                "val": p["val"].astype("int64"),
                "carry": pd.Series([0] * len(p), dtype="int64").values,
                "is_pair": pd.Series([1] * len(p), dtype="int32").values,
            }
        )

    raw_pairs = shingles.groupby("gb").map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def count_rows(t: pa.Table) -> pd.DataFrame:
        ids, ns = [], []
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            if len(toks) < SHINGLE_K:
                continue
            n = len(
                {
                    " ".join(toks[i : i + SHINGLE_K])
                    for i in range(len(toks) - SHINGLE_K + 1)
                }
            )
            ids.append(did)
            ns.append(n)
        k = pd.Series(ids, dtype="int64")
        return pd.DataFrame(
            {
                "gb": (k % nb).astype("int32"),
                "k": k,
                "other": pd.Series([-1] * len(k), dtype="int64").values,
                "val": pd.Series(ns, dtype="int64").values,
                "carry": pd.Series([0] * len(k), dtype="int64").values,
                "is_pair": pd.Series([0] * len(k), dtype="int32").values,
            }
        )

    counts = docs.map_batches(count_rows, batch_format="pyarrow")

    # round A: co-locate by doc_a — sum intersection partials across shingle
    # buckets AND attach n_a in one kernel, re-key by doc_b.
    u1 = raw_pairs.union(counts)

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        n_map = g[g["is_pair"] == 0].set_index("k")["val"]
        pairs = g[g["is_pair"] == 1]
        if pairs.empty:
            return g.iloc[0:0]
        summed = (
            pairs.groupby(["k", "other"], sort=False)["val"].sum().reset_index()
        )
        b = summed["other"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (b % nb).astype("int32"),
                "k": b,
                "other": summed["k"].astype("int64").values,
                "val": summed["val"].astype("int64").values,  # inter
                "carry": summed["k"].map(n_map).fillna(0).astype("int64").values,
                "is_pair": pd.Series([1] * len(summed), dtype="int32").values,
            }
        )

    r1 = u1.groupby("gb").map_groups(attach_a, batch_format="pandas")

    # round B: co-locate by doc_b — attach n_b, finish the exact Jaccard.
    u2 = r1.union(counts)

    def finish_b(g: pd.DataFrame) -> pd.DataFrame:
        n_map = g[g["is_pair"] == 0].set_index("k")["val"]
        pairs = g[g["is_pair"] == 1]
        if pairs.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "jaccard_permille": pd.Series(dtype="int64"),
                }
            )
        inter = pairs["val"].astype("int64")
        n_a = pairs["carry"].astype("int64")
        n_b = pairs["k"].map(n_map).fillna(0).astype("int64")
        union = n_a + n_b - inter
        keep = (union > 0) & (inter * 1000 >= threshold_permille * union)
        sub = pairs[keep]
        return pd.DataFrame(
            {
                "doc_a": sub["other"].astype("int64").values,
                "doc_b": sub["k"].astype("int64").values,
                "jaccard_permille": (
                    (inter[keep] * 1000) // union[keep]
                ).astype("int64").values,
            }
        )

    # no final sort (cosmetic all-to-all); the row SET is deterministic.
    return u2.groupby("gb").map_groups(finish_b, batch_format="pandas")


NGRAM_JACCARD_SQL = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         ws[CAST(u.i AS INT)] || ' ' || ws[CAST(u.i AS INT)+1]
           || ' ' || ws[CAST(u.i AS INT)+2] AS sh
  FROM w, UNNEST(range(1, len(ws)-1)) AS u(i)
  WHERE len(ws) >= 3
), n AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), i AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(inter*1000 // (na.n_sh + nb.n_sh - inter) AS BIGINT)
         AS jaccard_permille
FROM i JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
WHERE inter*1000 >= 200 * (na.n_sh + nb.n_sh - inter)
"""


# -- cross-source n-gram overlap matrix --------------------------------------

def source_overlap(sf_dir: str) -> "object":
    """Pairwise word-trigram Jaccard BETWEEN SOURCES — the corpus-level
    contamination matrix a curation pipeline reads before fixing mixture
    weights (which source pairs share content).  Same inverted-index shape
    as ``ngram_jaccard_pairs`` but at source grain: distinct (shingle,
    source) rows co-locate by crc32 shingle bucket, so in-bucket distinct
    IS global distinct (every copy of a shingle lands in one bucket); each
    kernel pre-sums per-source set sizes and per-pair intersections, and
    only O(|sources|^2) scalar partials leave the kernel.  The driver fold
    is |sources|^2 rows regardless of corpus size.  Integer-exact permille.
    Output: (src_a, src_b, inter, jaccard_permille) for pairs sharing >=1
    shingle."""
    import zlib

    import pandas as pd

    nb = _corpus_buckets(sf_dir)
    docs = _read_docs(sf_dir, ["source", "text"])

    def shingle_rows(t: pa.Table) -> pd.DataFrame:
        gbs, shs, srcs = [], [], []
        for src, text in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            for i in range(len(toks) - SHINGLE_K + 1):
                sh = " ".join(toks[i : i + SHINGLE_K])
                gbs.append(zlib.crc32(sh.encode()) % nb)
                shs.append(sh)
                srcs.append(src)
        return pd.DataFrame(
            {
                "gb": pd.Series(gbs, dtype="int32"),
                "sh": pd.Series(shs, dtype="object"),
                "source": pd.Series(srcs, dtype="object"),
            }
        ).drop_duplicates()

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["sh", "source"]].drop_duplicates()
        sizes = g.groupby("source").size().reset_index(name="cnt")
        sizes = pd.DataFrame(
            {
                "src_a": sizes["source"].astype("object"),
                "src_b": pd.Series([""] * len(sizes), dtype="object"),
                "cnt": sizes["cnt"].astype("int64"),
            }
        )
        m = g.merge(g, on="sh")
        m = m[m["source_x"] < m["source_y"]]
        inter = (
            m.groupby(["source_x", "source_y"]).size().reset_index(name="cnt")
        )
        inter = pd.DataFrame(
            {
                "src_a": inter["source_x"].astype("object"),
                "src_b": inter["source_y"].astype("object"),
                "cnt": inter["cnt"].astype("int64"),
            }
        )
        return pd.concat([sizes, inter], ignore_index=True)

    partials = (
        docs.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(bucket_fold, batch_format="pandas")
    )
    # size-guarded driver fold (the decontaminate escape pattern): each
    # bucket emits <= |sources| + |pairs-present| scalar rows, so under a
    # small bucket count the whole partial set is a few thousand rows —
    # folding them on the driver saves the second all-to-all (measured
    # 5.6 s -> 3.4 s at sf0.001/8 CPUs, pure fixed exchange cost).  Above
    # the guard (corpus-derived bucket counts) the distributed aggregate
    # keeps the driver out of the data path.
    if nb <= 4096:
        parts = (
            partials.to_pandas()
            .groupby(["src_a", "src_b"], as_index=False)["cnt"].sum()
            .rename(columns={"cnt": "n"})
        )
    else:
        parts = (
            partials.groupby(["src_a", "src_b"])
            .aggregate(ray.data.aggregate.Sum("cnt", alias_name="n"))
            .to_pandas()  # |sources|^2 rows
        )
    n_sh = (
        parts[parts["src_b"] == ""].set_index("src_a")["n"].astype("int64")
    )
    pairs = parts[parts["src_b"] != ""].copy()
    inter = pairs["n"].astype("int64")
    union = (
        pairs["src_a"].map(n_sh).astype("int64")
        + pairs["src_b"].map(n_sh).astype("int64")
        - inter
    )
    out = pd.DataFrame(
        {
            "src_a": pairs["src_a"].astype("object"),
            "src_b": pairs["src_b"].astype("object"),
            "inter": inter,
            "jaccard_permille": (inter * 1000 // union).astype("int64"),
        }
    )
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


SOURCE_OVERLAP_SQL = """
WITH w AS (
  SELECT source, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT source,
         ws[CAST(u.i AS INT)] || ' ' || ws[CAST(u.i AS INT)+1]
           || ' ' || ws[CAST(u.i AS INT)+2] AS sh
  FROM w, UNNEST(range(1, len(ws)-1)) AS u(i)
  WHERE len(ws) >= 3
), n AS (
  SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source
), i AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, CAST(inter AS BIGINT) AS inter,
       CAST(inter*1000 // (na.n_sh + nb.n_sh - inter) AS BIGINT)
         AS jaccard_permille
FROM i JOIN n na ON na.source = src_a JOIN n nb ON nb.source = src_b
ORDER BY src_a, src_b
"""


# -- exact-substring duplication coverage ------------------------------------

SUBSTR_K = 8  #: window length in word tokens (Lee et al. use 50 BPE tokens;
#: 8 words keeps the op meaningful on the short synthetic docs — a parameter,
#: not a semantic)


def substring_dup_coverage(sf_dir: str) -> Dataset:
    """Exact-substring duplication coverage per document — the
    training-data analog of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL 2022): a word position is *duplicated* if
    it lies inside a ``SUBSTR_K``-token window whose exact token sequence
    occurs >= 2 times in the whole corpus (across documents or repeated
    within one).  Emits one row per document: total token count, duplicated
    token count (union of overlapping duplicated windows, computed exactly),
    and the duplicated fraction in basis points (integer-exact).

    Distributed shape — two md5-uniform bucketed exchanges, both derived
    from corpus size, rows proportional to the corpus token count (the
    inherent cost of exact substring matching without a distributed suffix
    array):

    1. one corpus scan emits a row per window occurrence
       ``(gb=h%NB_g, h, doc_id, i)`` (h = 64-bit md5 of the window) plus one
       sentinel row per doc carrying its token count;
    2. window-hash-bucket groupby: inside a bucket every occurrence of a
       given h is present, so ``Series.duplicated(keep=False)`` IS the
       global count>=2 test — duplicated rows forward as
       ``(db=doc%NB_d, doc_id, i)``, sentinels pass through;
    3. doc-bucket groupby: per-doc interval union of the fixed-length
       windows via one vectorized sort + groupby.shift (covered =
       sum(min(K, next_start - start)), last window = K).

    A pathologically hot window (boilerplate repeated across the corpus)
    concentrates its occurrences in one bucket, but the in-bucket kernel is
    linear in rows (a duplicated-mask, no pairing), so skew degrades one
    task's size, never its asymptotics.  Both kernels emit arrow (pandas
    blocks cost ~13x through the sort/aggregate shuffle machinery)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets

    k = SUBSTR_K
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # gram rows ~ token count; estimate 64 windows/doc for bucket sizing
    # (sizing only — correctness is bucket-count invariant)
    nb_g = n_buckets(n_docs * 64)
    nb_d = n_buckets(n_docs)

    tok_re = re.compile(r"[a-z0-9_]+")

    def windows(batch: pa.Table) -> pa.Table:
        gb, h, dids, pos, nw = [], [], [], [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks = tok_re.findall(text.lower())
            for i in range(max(0, len(toks) - k + 1)):
                hv = int.from_bytes(
                    hashlib.md5(" ".join(toks[i : i + k]).encode()).digest()[:8],
                    "big",
                )
                gb.append(hv % nb_g)
                h.append(hv)
                dids.append(did)
                pos.append(i)
                nw.append(0)
            # sentinel row: carries the doc's token count through both
            # exchanges (i = -1 marks it; gb routing is arbitrary)
            gb.append(did % nb_g)
            h.append(0)
            dids.append(did)
            pos.append(-1)
            nw.append(len(toks))
        return pa.table(
            {
                "gb": pa.array(gb, pa.int64()),
                "h": pa.array(h, pa.uint64()),
                "doc_id": pa.array(dids, pa.int64()),
                "i": pa.array(pos, pa.int32()),
                "n_words": pa.array(nw, pa.int32()),
            }
        )

    def dup_windows(g: pd.DataFrame) -> pa.Table:
        sent = g["i"].to_numpy() < 0
        grams = g[~sent]
        keep = grams[grams["h"].duplicated(keep=False)]
        doc_id = np.concatenate(
            [keep["doc_id"].to_numpy(), g.loc[sent, "doc_id"].to_numpy()]
        )
        return pa.table(
            {
                "db": pa.array(doc_id % nb_d, pa.int64()),
                "doc_id": pa.array(doc_id, pa.int64()),
                "i": pa.array(
                    np.concatenate(
                        [keep["i"].to_numpy(), g.loc[sent, "i"].to_numpy()]
                    ),
                    pa.int32(),
                ),
                "n_words": pa.array(
                    np.concatenate(
                        [
                            keep["n_words"].to_numpy(),
                            g.loc[sent, "n_words"].to_numpy(),
                        ]
                    ),
                    pa.int32(),
                ),
            }
        )

    def coverage(g: pd.DataFrame) -> pa.Table:
        sent = g[g["i"] < 0][["doc_id", "n_words"]]
        dup = g[g["i"] >= 0].sort_values(["doc_id", "i"])
        nxt = dup.groupby("doc_id")["i"].shift(-1)
        gap = (nxt - dup["i"]).fillna(k).clip(upper=k).astype("int64")
        dw = gap.groupby(dup["doc_id"]).sum()
        out = sent.set_index("doc_id")["n_words"].astype("int64").to_frame()
        out["dup_words"] = dw.reindex(out.index).fillna(0).astype("int64")
        nwv = out["n_words"].to_numpy()
        dwv = out["dup_words"].to_numpy()
        bp = np.where(nwv > 0, dwv * 10000 // np.maximum(nwv, 1), 0)
        return pa.table(
            {
                "doc_id": pa.array(out.index.to_numpy(), pa.int64()),
                "n_words": pa.array(nwv, pa.int64()),
                "dup_words": pa.array(dwv, pa.int64()),
                "dup_bp": pa.array(bp, pa.int64()),
            }
        )

    rows = _read_docs(sf_dir, ["doc_id", "text"], small_aware=False).map_batches(
        windows, batch_format="pyarrow"
    )
    dups = rows.groupby("gb").map_groups(dup_windows, batch_format="pandas")
    return dups.groupby("db").map_groups(coverage, batch_format="pandas")


# DuckDB mirror: 1-based inclusive slices (toks[i:i+7] = 8 tokens), the same
# truncated-md5 window hash, count>=2 over ALL occurrences, DISTINCT covered
# positions instead of the interval-union formulation (equal by definition).
SUBSTRING_DUP_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(md5(array_to_string(toks[i:i+{SUBSTR_K - 1}], ' ')), 1, 16)) AS UBIGINT) AS h
  FROM t, unnest(range(1, greatest(len(toks) - {SUBSTR_K} + 1, 0) + 1)) AS u(i)
), dup AS (
  SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2
), pos AS (
  SELECT DISTINCT doc_id, i + v.j AS p
  FROM g JOIN dup USING (h), unnest(range(0, {SUBSTR_K})) AS v(j)
), dw AS (
  SELECT doc_id, COUNT(*) AS dup_words FROM pos GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_words,
       CAST(COALESCE(dw.dup_words, 0) AS BIGINT) AS dup_words,
       CAST(CASE WHEN len(toks) > 0
            THEN COALESCE(dw.dup_words, 0) * 10000 // len(toks)
            ELSE 0 END AS BIGINT) AS dup_bp
FROM t LEFT JOIN dw USING (doc_id)
ORDER BY t.doc_id
"""


# -- fuzzy key matching (edit-distance-1 entity resolution) ------------------

def _is_edit1(a: str, b: str) -> bool:
    """Exact edit-distance == 1 check for a candidate pair (a != b)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_name_pairs(sf_dir: str) -> Dataset:
    """Typo-tolerant entity-resolution self-join: all DISTINCT customer-name
    pairs at edit distance exactly 1 (one substituted / inserted / deleted
    character — the OCR-noise / data-entry-error match an ER pipeline runs
    before keying on names).  Exact recall via the deletion-neighborhood
    pigeonhole (public SymSpell construction): two strings at edit distance
    <= 1 share at least one member of their single-deletion neighborhoods
    (identity included), so emitting |name|+1 variant rows per name and
    grouping by variant finds every true pair; ``_is_edit1`` verifies
    in-bucket so false candidates never leave the kernel.  Exchanges: one
    crc32(variant)-bucket shuffle (rows = names x (len+1), each a few
    bytes) + one distinct over the output-sized verified pairs (a pair can
    share several variants).  Skew note: a variant group's candidate count
    is C(g,2); g is bounded by the alphabet per edit position in key-like
    data — free-text callers should pre-filter to keys/vocab.  Output:
    (name_a, name_b)."""
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets, read_small_aware

    n_names = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    nb = n_buckets(n_names * 20)  # ~len(name)+1 variant rows per name
    names = read_small_aware(
        f"{sf_dir}/customer.parquet", columns=["c_name"]
    )

    def variants(t: pa.Table) -> pd.DataFrame:
        gbs, vs, ns = [], [], []
        for name in set(t.column("c_name").to_pylist()):
            seen = {name}
            for i in range(len(name)):
                seen.add(name[:i] + name[i + 1:])
            for v in seen:
                gbs.append(zlib.crc32(v.encode()) % nb)
                vs.append(v)
                ns.append(name)
        return pd.DataFrame(
            {
                "gb": pd.Series(gbs, dtype="int32"),
                "var": pd.Series(vs, dtype="object"),
                "name": pd.Series(ns, dtype="object"),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # arrow output: the downstream distinct+sort exchanges sort arrow
        # blocks ~13x faster than pandas blocks (BASELINE.md finding)
        g = g[["var", "name"]].drop_duplicates()
        out = set()
        for _, grp in g.groupby("var", sort=False):
            mem = sorted(set(grp["name"]))
            if len(mem) < 2:
                continue
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    if _is_edit1(mem[i], mem[j]):
                        out.add((mem[i], mem[j]))
        ks = sorted(out)
        return pa.table(
            {
                "name_a": pa.array([k[0] for k in ks], pa.string()),
                "name_b": pa.array([k[1] for k in ks], pa.string()),
            }
        )

    def key_pair(t: pa.Table) -> pa.Table:
        import numpy as np

        pk = np.fromiter(
            (
                zlib.crc32(f"{a}|{b}".encode()) % nb
                for a, b in zip(
                    t.column("name_a").to_pylist(),
                    t.column("name_b").to_pylist(),
                )
            ),
            dtype=np.int32,
            count=t.num_rows,
        )
        return t.append_column("pb", pa.array(pk))

    def distinct_pairs(g: "object") -> pa.Table:
        d = g[["name_a", "name_b"]].drop_duplicates()
        return pa.table(
            {
                "name_a": pa.array(d["name_a"].astype(str), pa.string()),
                "name_b": pa.array(d["name_b"].astype(str), pa.string()),
            }
        )

    return (
        names.map_batches(variants, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(bucket_pairs, batch_format="pandas")
        # pair dedup inside a pair-hash bucket kernel: a direct groupby on
        # the pair is OUTPUT-proportional in groups and this Ray build's
        # aggregate cost scales with group count (BASELINE session-5)
        .map_batches(key_pair, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(distinct_pairs, batch_format="pandas")
        # no final sort: pair order is not part of the contract and the
        # sort is a full extra all-to-all (the minhash_lsh_pairs precedent)
    )


FUZZY_NAME_PAIRS_SQL = """
WITH v AS (SELECT DISTINCT c_name AS n FROM customer),
pos AS (
  -- per-name deletion positions 0..len(n): no fixed cap, so 64+-char
  -- names keep their full variant neighborhood (round-3 ADVICE)
  SELECT n, unnest(generate_series(0, len(n))) AS i FROM v
),
vars AS (
  SELECT n, CASE WHEN i = 0 THEN n
           ELSE substr(n, 1, i - 1) || substr(n, i + 1) END AS var
  FROM pos
), cand AS (
  SELECT DISTINCT a.n AS name_a, b.n AS name_b
  FROM vars a JOIN vars b ON a.var = b.var AND a.n < b.n
)
SELECT name_a, name_b FROM cand
WHERE levenshtein(name_a, name_b) = 1
ORDER BY name_a, name_b
"""


# -- exact-substring dedup REWRITE (keep one copy, Lee et al. 2022) -----------

def substring_dedup_rewrite(sf_dir: str, emit: str = "md5") -> Dataset:
    """Exact-substring deduplication with REWRITE — the acting half of Lee
    et al. (ACL 2022), where [[substring-dup-coverage]] is the measuring
    half: every corpus-duplicated ``SUBSTR_K``-token window keeps exactly
    ONE copy (the keeper = lexicographically smallest (doc_id, position)
    occurrence, elected exactly because all occurrences of a window hash
    co-locate in its bucket) and every other occurrence is removed.  A
    token position is removed iff it is covered by >=1 duplicated-window
    occurrence and NOT covered by any keeper occurrence — so the surviving
    copy stays intact even where it overlaps removed windows.  Output per
    doc: (doc_id, n_words, n_removed, residual_md5) where residual is the
    kept tokens joined by single spaces; the md5 keeps the QUERY surface
    driver-light, while ``emit="text"`` adds the rewritten ``residual``
    column itself — the form ``tools/run_dedup.py`` streams straight into
    a deduplicated corpus write (never through the driver).

    Distributed shape: the [[substring-dup-coverage]] scan + window-hash
    bucket exchange, plus keeper election (an in-bucket argmin) and ONE
    doc-bucket co-location where dup/keeper intervals meet the doc text
    (text routed once, flag-unioned — the line_dedup rebuild pattern);
    interval painting is two np.add.at difference arrays, linear in rows."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets

    k = SUBSTR_K
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nb_g = n_buckets(n_docs * 64)
    nb_d = n_buckets(n_docs)
    tok_re = re.compile(r"[a-z0-9_]+")

    def windows(batch: pa.Table) -> pa.Table:
        gb, h, dids, pos = [], [], [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks = tok_re.findall(text.lower())
            for i in range(max(0, len(toks) - k + 1)):
                hv = int.from_bytes(
                    hashlib.md5(
                        " ".join(toks[i : i + k]).encode()
                    ).digest()[:8],
                    "big",
                )
                gb.append(hv % nb_g)
                h.append(hv)
                dids.append(did)
                pos.append(i)
        return pa.table(
            {
                "gb": pa.array(gb, pa.int64()),
                "h": pa.array(h, pa.uint64()),
                "doc_id": pa.array(dids, pa.int64()),
                "i": pa.array(pos, pa.int32()),
            }
        )

    def elect(g: pd.DataFrame) -> pa.Table:
        # all occurrences of a window hash are in this bucket: count>=2 is
        # the dup test and the min (doc_id, i) key is the global keeper
        dup = g[g["h"].duplicated(keep=False)].copy()
        if not len(dup):
            # emit the FULL union schema even when empty: a downstream
            # map_batches would skip empty blocks, so they could never be
            # padded later (the map_batches empty-block gotcha)
            return pa.table(
                {
                    "db": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "i": pa.array([], pa.int32()),
                    "is_keeper": pa.array([], pa.int8()),
                    "text": pa.array([], pa.string()),
                }
            )
        key = dup["doc_id"].to_numpy(np.int64) * np.int64(1 << 32) + dup[
            "i"
        ].to_numpy(np.int64)
        dup["kk"] = key
        kmin = dup.groupby("h")["kk"].transform("min")
        isk = (dup["kk"] == kmin).to_numpy()
        did = dup["doc_id"].to_numpy(np.int64)
        return pa.table(
            {
                "db": pa.array(did % nb_d, pa.int64()),
                "doc_id": pa.array(did),
                "i": pa.array(dup["i"].to_numpy(np.int32)),
                "is_keeper": pa.array(isk.astype(np.int8)),
                "text": pa.array([""] * len(did), pa.string()),
            }
        )

    def text_rows(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array(did % nb_d, pa.int64()),
                "doc_id": pa.array(did.astype(np.int64)),
                "i": pa.array(np.full(len(did), -1, dtype=np.int32)),
                "is_keeper": pa.array(np.zeros(len(did), dtype=np.int8)),
                "text": batch.column("text"),
            }
        )

    def rewrite(g: pd.DataFrame) -> pa.Table:
        occ = g[g["i"] >= 0]
        texts = g[g["i"] < 0]
        ids, nw, nr, md = [], [], [], []
        occ_by_doc = dict(iter(occ.groupby("doc_id"))) if len(occ) else {}
        for did, text in zip(texts["doc_id"], texts["text"]):
            toks = tok_re.findall(text.lower())
            n = len(toks)
            o = occ_by_doc.get(did)
            if o is None or not n:
                ids.append(did)
                nw.append(n)
                nr.append(0)
                res0 = " ".join(toks)
                md.append(res0 if emit == "text"
                          else hashlib.md5(res0.encode()).hexdigest())
                continue
            # interval painting via difference arrays: dup coverage and
            # keeper coverage, each one np.add.at + cumsum
            cov = np.zeros(n + 1, dtype=np.int64)
            kee = np.zeros(n + 1, dtype=np.int64)
            st = o["i"].to_numpy(np.int64)
            en = np.minimum(st + k, n)
            isk = o["is_keeper"].to_numpy(np.int8).astype(bool)
            np.add.at(cov, st, 1)
            np.add.at(cov, en, -1)
            if isk.any():
                np.add.at(kee, st[isk], 1)
                np.add.at(kee, en[isk], -1)
            removed = (np.cumsum(cov[:-1]) > 0) & ~(np.cumsum(kee[:-1]) > 0)
            kept = [t_ for t_, r_ in zip(toks, removed) if not r_]
            ids.append(did)
            nw.append(n)
            nr.append(int(removed.sum()))
            res = " ".join(kept)
            md.append(res if emit == "text"
                      else hashlib.md5(res.encode()).hexdigest())
        if emit == "text":
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_words": pa.array(nw, pa.int64()),
                    "n_removed": pa.array(nr, pa.int64()),
                    "residual": pa.array(md, pa.string()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_removed": pa.array(nr, pa.int64()),
                "residual_md5": pa.array(md, pa.string()),
            }
        )

    occ = (
        _read_docs(sf_dir, ["doc_id", "text"], small_aware=False)
        .map_batches(windows, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(elect, batch_format="pandas")
    )
    txt = _read_docs(sf_dir, ["doc_id", "text"], small_aware=False).map_batches(
        text_rows, batch_format="pyarrow"
    )
    return occ.union(txt).groupby("db").map_groups(
        rewrite, batch_format="pandas"
    )


SUBSTRING_DEDUP_REWRITE_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, u.i - 1 AS i0,
         CAST(concat('0x', substr(md5(array_to_string(toks[u.i:u.i+{SUBSTR_K - 1}], ' ')), 1, 16)) AS UBIGINT) AS h
  FROM t, unnest(range(1, greatest(len(toks) - {SUBSTR_K} + 1, 0) + 1)) AS u(i)
), c AS (
  SELECT h, COUNT(*) AS cnt,
         MIN(doc_id * 4294967296 + i0) AS kk
  FROM g GROUP BY h
), d AS (
  SELECT g.doc_id, g.i0,
         (g.doc_id * 4294967296 + g.i0) = c.kk AS isk
  FROM g JOIN c USING (h) WHERE c.cnt >= 2
), pos AS (
  SELECT doc_id, i0 + u.off AS p, BOOL_OR(isk) AS anyk
  FROM d, unnest(range({SUBSTR_K})) AS u(off)
  GROUP BY doc_id, p
), rem AS (SELECT doc_id, p FROM pos WHERE NOT anyk),
tokpos AS (
  SELECT doc_id, u.i - 1 AS p, toks[u.i] AS tok
  FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
), keptt AS (
  SELECT tp.doc_id, tp.p, tp.tok
  FROM tokpos tp LEFT JOIN rem ON tp.doc_id = rem.doc_id AND tp.p = rem.p
  WHERE rem.doc_id IS NULL
), res AS (
  SELECT doc_id, COALESCE(string_agg(tok, ' ' ORDER BY p), '') AS r,
         COUNT(*) AS n_kept
  FROM keptt GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_words,
       CAST(len(toks) - COALESCE(res.n_kept, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(res.r, '')) AS residual_md5
FROM t LEFT JOIN res USING (doc_id)
ORDER BY t.doc_id
"""


# -- sorted-neighborhood ER blocking (rank-segment halo exchange) --------------

#: window size: candidate pairs at rank distance 1..SN_WINDOW-1
SN_WINDOW = 8
#: rank-segment width; rows per pair task ≤ _SN_SEG + SN_WINDOW - 1
_SN_SEG = 1 << 16
#: max rows one rank task may co-locate (the windows.py salting bound)
SN_RANK_TASK_BOUND = 1 << 18
_SN_BUCKET_C2 = 4_096


def sorted_neighborhood_pairs(sf_dir: str) -> Dataset:
    """Sorted-neighborhood entity-resolution blocking over customers: sort
    by (account balance, custkey), slide a ``SN_WINDOW``-row window, and
    emit same-market-segment candidate pairs with their rank gap — the
    classic ER blocking strategy complementary to this module's
    deletion-neighborhood (SymSpell) and LSH blockers: it catches
    near-misses on a CONTINUOUS attribute that token/shingle blockers
    cannot see.

    Distributed plan, three bounded exchanges and a new pattern for this
    repo — the RANK-SEGMENT HALO:

    1. counting-histogram pass over balance-cents buckets gives the
       driver exact "rows below" offsets (O(domain/4096) counts; buckets
       over ``SN_RANK_TASK_BOUND`` are salted by the custkey range with
       exact fine-count offsets — the windows.global_price_rank guard,
       here in ASCENDING order);
    2. one bucket co-location assigns exact global ranks and re-keys each
       row to rank segment ``rnk // 65536`` — plus a HALO copy into the
       next segment for the last ``SN_WINDOW−1`` ranks of each segment,
       so every window fits inside one task (w ≪ segment ⇒ one halo hop
       suffices; ranks are contiguous, so a segment's frame is a closed
       rank interval);
    3. the per-segment kernel sorts its ≤ 65543 rows once and emits the
       d = 1..7 pairs by aligned slices; a pair is emitted only where its
       HIGHER-rank row is segment-native, so halo duplicates drop exactly.

    Output: (cust_a, cust_b, gap), same-mktsegment pairs only.
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ._util import read_small_aware
    from .sketches import _floor_bucket

    cols = ["c_custkey", "c_acctbal", "c_mktsegment"]
    ds = read_small_aware(f"{sf_dir}/customer.parquet", columns=cols)

    def hist(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)), pa.int64())
        folded = pa.table({"b": _floor_bucket(v, _SN_BUCKET_C2)})
        return pa.TableGroupBy(folded, "b").aggregate([([], "count_all")])

    counts = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
        .to_pandas()  # O(domain/4096)
        .sort_values("b")
        .reset_index(drop=True)
    )
    below = counts["n"].cumsum().shift(1).fillna(0).astype("int64")
    bucket_offsets = dict(zip(counts["b"].astype(int), below))
    overfull = {
        int(b)
        for b, n in zip(counts["b"], counts["n"])
        if int(n) > SN_RANK_TASK_BOUND
    }
    offsets: dict[str, int] = {
        f"b{b}": int(off) for b, off in bucket_offsets.items()
        if b not in overfull
    }
    if overfull:
        over_arr = pa.array(sorted(overfull), pa.int64())

        def fine_hist(t: pa.Table) -> pa.Table:
            v = pc.cast(
                pc.round(pc.multiply(t["c_acctbal"], 100.0)), pa.int64()
            )
            ck = pc.cast(t["c_custkey"], pa.int64())
            sub = pa.table(
                {
                    "b": _floor_bucket(v, _SN_BUCKET_C2),
                    "v": v,
                    "ckb": _floor_bucket(ck, _SN_BUCKET_C2),
                }
            ).filter(pc.is_in(_floor_bucket(v, _SN_BUCKET_C2),
                              value_set=over_arr))
            return pa.TableGroupBy(sub, ["b", "v", "ckb"]).aggregate(
                [([], "count_all")]
            )

        fine = (
            ds.map_batches(fine_hist, batch_format="pyarrow")
            .groupby(["b", "v", "ckb"])
            .aggregate(ray.data.aggregate.Sum("count_all", alias_name="n"))
            .to_pandas()  # counts per (value, custkey-range), never rows
        )
        for b, sub in fine.groupby("b"):
            sub = sub.sort_values(["v", "ckb"]).reset_index(drop=True)
            run = int(bucket_offsets[int(b)])
            for v, ckb, n in zip(sub["v"], sub["ckb"], sub["n"]):
                offsets[f"f{int(v)}|{int(ckb)}"] = run
                run += int(n)

    overfull_arr = (
        pa.array(sorted(overfull), pa.int64()) if overfull else None
    )

    def keyed(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)), pa.int64())
        ck = pc.cast(t["c_custkey"], pa.int64())
        b = _floor_bucket(v, _SN_BUCKET_C2)
        if overfull_arr is None:
            return pa.table(
                {"gk": pc.cast(b, pa.string()), "c_custkey": ck, "v": v,
                 "seg_col": t["c_mktsegment"]}
            )
        gk = pc.binary_join_element_wise("b", pc.cast(b, pa.string()), "")
        salted = pc.binary_join_element_wise(
            "f", pc.cast(v, pa.string()), "|",
            pc.cast(_floor_bucket(ck, _SN_BUCKET_C2), pa.string()), "",
        )
        gk = pc.if_else(pc.is_in(b, value_set=overfull_arr), salted, gk)
        return pa.table(
            {"gk": gk, "c_custkey": ck, "v": v, "seg_col": t["c_mktsegment"]}
        )

    w = SN_WINDOW
    seg_w = _SN_SEG  # local capture: closures ship the patched test value

    def rank_and_segment(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["v", "c_custkey"]).reset_index(drop=True)
        k = g["gk"].iloc[0]
        key = f"b{int(k)}" if overfull_arr is None else str(k)
        base = int(offsets[key])
        rnk = base + np.arange(1, len(g) + 1, dtype=np.int64)
        seg = rnk // seg_w
        halo = (rnk % seg_w) >= seg_w - (w - 1)
        ck = g["c_custkey"].to_numpy(np.int64)
        ms = g["seg_col"].to_numpy()
        out_seg = np.concatenate((seg, seg[halo] + 1))
        out_rnk = np.concatenate((rnk, rnk[halo]))
        out_ck = np.concatenate((ck, ck[halo]))
        out_ms = np.concatenate((ms, ms[halo]))
        return pa.table(
            {
                "seg": pa.array(out_seg, pa.int64()),
                "rnk": pa.array(out_rnk, pa.int64()),
                "c_custkey": pa.array(out_ck, pa.int64()),
                "mkt": pa.array(out_ms, pa.string()),
            }
        )

    def window_pairs(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("rnk").reset_index(drop=True)
        seg = int(g["seg"].iloc[0])
        rnk = g["rnk"].to_numpy(np.int64)
        ck = g["c_custkey"].to_numpy(np.int64)
        ms = g["mkt"].to_numpy()
        a_l, b_l, gap_l = [], [], []
        for d in range(1, w):
            if len(rnk) <= d:
                break
            ra, rb = rnk[:-d], rnk[d:]
            # ranks are contiguous inside the frame, but guard anyway;
            # dedup: the HIGHER-rank row must be native to this segment
            m = (rb - ra == d) & (rb // seg_w == seg) & (ms[:-d] == ms[d:])
            a_l.append(ck[:-d][m])
            b_l.append(ck[d:][m])
            gap_l.append(np.full(int(m.sum()), d, dtype=np.int64))
        if a_l:
            aa = np.concatenate(a_l)
            bb = np.concatenate(b_l)
            gg = np.concatenate(gap_l)
        else:
            aa = bb = gg = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "cust_a": pa.array(aa, pa.int64()),
                "cust_b": pa.array(bb, pa.int64()),
                "gap": pa.array(gg, pa.int64()),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(rank_and_segment, batch_format="pandas")
        .groupby("seg")
        .map_groups(window_pairs, batch_format="pandas")
    )


SORTED_NEIGHBORHOOD_SQL = f"""
WITH r AS (
  SELECT c_custkey, c_mktsegment,
         ROW_NUMBER() OVER (
           ORDER BY ROUND(c_acctbal*100), c_custkey) AS rnk
  FROM customer
)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       CAST(b.rnk - a.rnk AS BIGINT) AS gap
FROM r a JOIN r b
  ON b.rnk > a.rnk AND b.rnk < a.rnk + {SN_WINDOW}
WHERE a.c_mktsegment = b.c_mktsegment
ORDER BY cust_a, cust_b, gap
"""


# -- Fellegi-Sunter EM record-linkage weights ----------------------------------

EM_LINKAGE_ROUNDS = 5
#: EM parameter clamp (micro units): keeps every probability in
#: (0, 1) exclusive so the fixed-point products never collapse to 0 — the
#: same clamp runs in the oracle.
_EM_CLAMP = (1, 999_999)


def _em_linkage_rounds(pat: dict[int, int], rounds: int = EM_LINKAGE_ROUNDS):
    """The exact fixed-point Fellegi-Sunter EM replay both sides share:
    all probabilities live in micro units (1e-6), every multiply is
    ``a*b // 1e6`` and every normalize is a floored integer divide, in a
    FIXED feature fold order — so the oracle's unrolled CTE chain is
    bit-identical.  ``pat`` maps the 3-bit agreement pattern to its pair
    count.  Returns one (round, p, m0..m2, u0..u2) tuple per round."""
    M = 10**6
    p, m, u = 100_000, [900_000] * 3, [100_000] * 3
    out = []
    clamp = lambda x: max(_EM_CLAMP[0], min(_EM_CLAMP[1], x))  # noqa: E731
    for rnd in range(1, rounds + 1):
        s1 = n_tot = 0
        sm = [0, 0, 0]
        su = [0, 0, 0]
        s0 = 0
        for g in range(8):
            n = pat.get(g, 0)
            if n == 0:
                continue
            mp, up = p, M - p
            for k in range(3):
                mt = m[k] if (g >> k) & 1 else M - m[k]
                ut = u[k] if (g >> k) & 1 else M - u[k]
                mp = mp * mt // M
                up = up * ut // M
            w = mp * M // (mp + up)
            nw = n * w
            nv = n * (M - w)
            s1 += nw
            s0 += nv
            n_tot += n
            for k in range(3):
                if (g >> k) & 1:
                    sm[k] += nw
                    su[k] += nv
        p = clamp(s1 // n_tot)
        m = [clamp(sm[k] * M // s1) for k in range(3)]
        u = [clamp(su[k] * M // s0) for k in range(3)]
        out.append((rnd, p, *m, *u))
    return out


def em_linkage_weights(sf_dir: str) -> "object":
    """Fellegi-Sunter probabilistic record linkage (JASA 1969 — THE
    foundational ER model): EM-fit match probability and per-feature
    m/u agreement probabilities over candidate customer pairs, from
    nothing but the 8-cell agreement-PATTERN histogram (the classic
    sufficient-statistics reduction: EM never revisits pairs).

    Candidates here are same-$1-acctbal-bucket pairs (one value-bucket
    co-location; in-bucket pairs are vectorized).  At open-ended scale the
    candidate generator composes with ``sorted_neighborhood_pairs``'s
    rank-halo blocking instead — the EM input is the same bounded pattern
    table either way, which is the point: the fold ships 8 cells, never
    pairs.  Features: same nation, same segment, |acctbal| within $5.
    EM runs ``EM_LINKAGE_ROUNDS`` exact fixed-point micro-unit rounds
    (every multiply floors; the oracle replays them as an unrolled CTE
    chain).  Output: (round, p_mu, m0_mu..m2_mu, u0_mu..u2_mu).
    Beyond-reference engine addition (SURVEY.md §2.8)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ._util import read_small_aware

    ds = read_small_aware(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def keyed(t: pa.Table) -> pa.Table:
        bal = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)), pa.int64())
        return pa.table(
            {
                # $1 buckets; arithmetic shift floors for negative balances
                "bb": pc.cast(pc.shift_right(bal, 7), pa.int32()),
                "k": pc.cast(t["c_custkey"], pa.int64()),
                "nat": pc.cast(t["c_nationkey"], pa.int64()),
                "seg": t["c_mktsegment"],
                "bal": bal,
            }
        )

    def patterns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("k").reset_index(drop=True)
        m = g.merge(g, on="bb")
        m = m[m["k_x"] < m["k_y"]]
        if len(m) == 0:
            return pd.DataFrame(
                {"g": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        f0 = (m["nat_x"] == m["nat_y"]).to_numpy()
        f1 = (m["seg_x"] == m["seg_y"]).to_numpy()
        f2 = (np.abs(m["bal_x"] - m["bal_y"]) <= 500).to_numpy()
        gpat = f0.astype(np.int64) + 2 * f1 + 4 * f2
        out = pd.DataFrame({"g": gpat}).groupby("g", as_index=False).size()
        return out.rename(columns={"size": "n"}).astype(
            {"g": "int64", "n": "int64"}
        )

    pat_df = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("bb")
        .map_groups(patterns, batch_format="pandas")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 8 rows
    )
    pat = {int(r.g): int(r.n) for r in pat_df.itertuples()}
    rows = _em_linkage_rounds(pat)
    cols = ["round", "p_mu", "m0_mu", "m1_mu", "m2_mu",
            "u0_mu", "u1_mu", "u2_mu"]
    return pd.DataFrame(rows, columns=cols).astype(
        {c: "int64" for c in cols}
    )


def _em_linkage_sql() -> str:
    M = 10**6
    lo, hi = _EM_CLAMP

    def clamp(x: str) -> str:
        return f"GREATEST({lo}, LEAST({hi}, {x}))"

    rounds_sql = []
    prev = "s0"
    for r in range(1, EM_LINKAGE_ROUNDS + 1):
        # per-pattern weights off the previous state, then the fold
        mp = f"{prev}.p"
        up = f"({M} - {prev}.p)"
        for k in range(3):
            mt = (
                f"(CASE WHEN (pat.g >> {k}) & 1 = 1 THEN {prev}.m{k} "
                f"ELSE {M} - {prev}.m{k} END)"
            )
            ut = (
                f"(CASE WHEN (pat.g >> {k}) & 1 = 1 THEN {prev}.u{k} "
                f"ELSE {M} - {prev}.u{k} END)"
            )
            mp = f"(({mp}) * {mt} // {M})"
            up = f"(({up}) * {ut} // {M})"
        rounds_sql.append(
            f"w{r} AS (\n"
            f"  SELECT pat.g, pat.n,\n"
            f"         ({mp}) * {M} // (({mp}) + ({up})) AS w\n"
            f"  FROM pat CROSS JOIN {prev}\n"
            f"),\n"
            f"s{r} AS (\n"
            f"  SELECT {r} AS round,\n"
            f"    {clamp(f'SUM(n * w) // SUM(n)')} AS p,\n"
            + ",\n".join(
                f"    {clamp(f'SUM(CASE WHEN (g >> {k}) & 1 = 1 THEN n * w ELSE 0 END) * {M} // SUM(n * w)')} AS m{k}"
                for k in range(3)
            )
            + ",\n"
            + ",\n".join(
                f"    {clamp(f'SUM(CASE WHEN (g >> {k}) & 1 = 1 THEN n * ({M} - w) ELSE 0 END) * {M} // SUM(n * ({M} - w))')} AS u{k}"
                for k in range(3)
            )
            + f"\n  FROM w{r}\n)"
        )
        prev = f"s{r}"
    chain = ",\n".join(rounds_sql)
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST(round AS BIGINT) AS round, CAST(p AS BIGINT) AS p_mu,"
        f" CAST(m0 AS BIGINT) AS m0_mu, CAST(m1 AS BIGINT) AS m1_mu,"
        f" CAST(m2 AS BIGINT) AS m2_mu, CAST(u0 AS BIGINT) AS u0_mu,"
        f" CAST(u1 AS BIGINT) AS u1_mu, CAST(u2 AS BIGINT) AS u2_mu"
        f" FROM s{r}"
        for r in range(1, EM_LINKAGE_ROUNDS + 1)
    )
    return f"""
WITH c AS (
  SELECT c_custkey AS k, c_nationkey AS nat, c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) // 128
           - CASE WHEN CAST(ROUND(c_acctbal * 100) AS BIGINT) < 0
                   AND CAST(ROUND(c_acctbal * 100) AS BIGINT) % 128 != 0
                  THEN 1 ELSE 0 END AS bb
  FROM customer
),
pat AS (
  SELECT (CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END)
       + 2 * (CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END)
       + 4 * (CASE WHEN ABS(a.bal - b.bal) <= 500 THEN 1 ELSE 0 END) AS g,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c a JOIN c b ON a.bb = b.bb AND a.k < b.k
  GROUP BY 1
),
s0 AS (SELECT CAST(100000 AS BIGINT) AS p,
              CAST(900000 AS BIGINT) AS m0, CAST(900000 AS BIGINT) AS m1,
              CAST(900000 AS BIGINT) AS m2,
              CAST(100000 AS BIGINT) AS u0, CAST(100000 AS BIGINT) AS u1,
              CAST(100000 AS BIGINT) AS u2),
{chain}
{selects}
ORDER BY round
"""


EM_LINKAGE_SQL = _em_linkage_sql()


# -- MinHash estimator calibration --------------------------------------------


class MinHashPayloads:
    """Actor stage: documents -> (doc_id, 'sig_csv|shingle_rs') — the
    signature AND the sorted shingle string in one carry payload, so the
    calibration kernel never re-hashes a document per pair."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            sh = _shingles(t)
            sig = _minhash_sig(sh)
            out.append(
                ",".join(map(str, sig)) + "|" + "\x1e".join(sorted(sh))
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pa.array(out, pa.string()),
            }
        )


def minhash_jaccard_calibration(sf_dir: str) -> "object":
    """Estimator-calibration audit of the MinHash pipeline: over every LSH
    CANDIDATE pair (no similarity filter), bin pairs by how many of the 16
    signature hashes agree (the unbiased Jaccard estimate is agree/16) and
    report the exact shingle-Jaccard mass per bin — the plot that tells you
    whether the sketch's bands/rows trade-off is calibrated before trusting
    it at 10^12 docs.  Output: (agree_n, n_pairs, sum_exact_permille),
    <= 17 rows; exact permille is integer floor (inter*1000)//union on both
    engines, and pairs with an empty union are excluded on both (the
    oracle's den>0 guard).

    Distributed shape = minhash_lsh_pairs': banded signatures -> in-bucket
    candidate pairs (capped, approximate path only) -> two union +
    groupby(bucket).map_groups co-location rounds that attach each side's
    payload; the per-pair kernel folds straight to (agree_n, count, sum)
    partials, so the final exchange is O(17) rows per bucket."""
    import pandas as pd

    from ray.data.aggregate import Sum

    nb = _corpus_buckets(sf_dir)
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(MinHashBands(nb), batch_format="pyarrow")

    import logging

    log = logging.getLogger(__name__)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list[int] = []
        out_b: list[int] = []
        for (_bid, _bh), grp in g.groupby(["band_id", "band_hash"]):
            ids = sorted(set(grp["doc_id"]))
            if len(ids) < 2:
                continue
            if len(ids) > MAX_BUCKET:
                log.warning(
                    "LSH bucket capped at %d of %d members (calibration)",
                    MAX_BUCKET, len(ids),
                )
                ids = ids[:MAX_BUCKET]
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
            }
        )

    raw_pairs = bands.groupby("gb").map_groups(bucket_pairs, batch_format="pandas")

    payload_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashPayloads(), batch_format="pyarrow"
    )

    def pairs_r1(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_a"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (k % nb).astype("int32"),
                "k": k,
                "other": t["doc_b"].astype("int64"),
                "sh_carry": "",
                "sh": "",
                "is_pair": pd.Series([1] * len(t), dtype="int32").values,
            }
        )

    def sh_r1(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (k % nb).astype("int32"),
                "k": k,
                "other": pd.Series([-1] * len(t), dtype="int64").values,
                "sh_carry": "",
                "sh": t["shingles"].values,
                "is_pair": pd.Series([0] * len(t), dtype="int32").values,
            }
        )

    u1 = raw_pairs.map_batches(pairs_r1, batch_format="pandas").union(
        payload_ds.map_batches(sh_r1, batch_format="pandas")
    )

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        sh_map = g[g["is_pair"] == 0].set_index("k")["sh"]
        pairs = g[g["is_pair"] == 1][["k", "other"]].drop_duplicates()
        if pairs.empty:
            return pd.DataFrame(
                {
                    "gb": pd.Series(dtype="int32"),
                    "k": pd.Series(dtype="int64"),
                    "other": pd.Series(dtype="int64"),
                    "sh_carry": pd.Series(dtype="object"),
                    "sh": pd.Series(dtype="object"),
                    "is_pair": pd.Series(dtype="int32"),
                }
            )
        sh_a = pairs["k"].map(sh_map).fillna("")
        doc_b = pairs["other"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (doc_b % nb).astype("int32"),
                "k": doc_b,
                "other": pairs["k"].astype("int64").values,
                "sh_carry": sh_a.values,
                "sh": "",
                "is_pair": pd.Series([1] * len(pairs), dtype="int32").values,
            }
        )

    r1 = u1.groupby("gb").map_groups(attach_a, batch_format="pandas")
    u2 = r1.union(payload_ds.map_batches(sh_r1, batch_format="pandas"))

    def calibrate_b(g: pd.DataFrame) -> pd.DataFrame:
        sh_map = g[g["is_pair"] == 0].set_index("k")["sh"]
        pairs = g[g["is_pair"] == 1]
        acc: dict[int, list[int]] = {}
        for doc_b, pay_a in zip(pairs["k"], pairs["sh_carry"]):
            pay_b = sh_map.get(doc_b, "")
            sig_a_s, _, sh_a_raw = pay_a.partition("|")
            sig_b_s, _, sh_b_raw = pay_b.partition("|")
            A = set(sh_a_raw.split("\x1e")) if sh_a_raw else set()
            B = set(sh_b_raw.split("\x1e")) if sh_b_raw else set()
            inter = len(A & B)
            union = len(A) + len(B) - inter
            if union == 0:
                continue
            agree = sum(
                x == y
                for x, y in zip(sig_a_s.split(","), sig_b_s.split(","))
            )
            slot = acc.setdefault(agree, [0, 0])
            slot[0] += 1
            slot[1] += inter * 1000 // union
        ks = sorted(acc)
        return pd.DataFrame(
            {
                "agree_n": pd.Series(ks, dtype="int64"),
                "n_p": pd.Series([acc[k][0] for k in ks], dtype="int64"),
                "s_e": pd.Series([acc[k][1] for k in ks], dtype="int64"),
            }
        )

    out = (
        u2.groupby("gb")
        .map_groups(calibrate_b, batch_format="pandas")
        .groupby("agree_n")
        .aggregate(
            Sum("n_p", alias_name="n_pairs"),
            Sum("s_e", alias_name="sum_exact_permille"),
        )
        .to_pandas()  # <= 17 rows
        .sort_values("agree_n")
        .reset_index(drop=True)
    )
    for c in ("agree_n", "n_pairs", "sum_exact_permille"):
        out[c] = out[c].astype("int64")
    return out


MINHASH_CALIBRATION_SQL = _MINHASH_BASE_CTES + """, ag AS (
  SELECT c.doc_a, c.doc_b,
         SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS agree
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.salt = sa.salt
  GROUP BY 1, 2
), ex AS (
  SELECT c.doc_a, c.doc_b,
         (len(list_intersect(sa.shingles, sb.shingles)) * 1000)
           // (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))) AS exp
  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b
  WHERE len(sa.shingles) + len(sb.shingles)
        - len(list_intersect(sa.shingles, sb.shingles)) > 0
)
SELECT CAST(agree AS BIGINT) AS agree_n,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(exp) AS BIGINT) AS sum_exact_permille
FROM ag JOIN ex USING (doc_a, doc_b)
GROUP BY 1 ORDER BY 1
"""


# -- boilerplate shingle detection --------------------------------------------


def boilerplate_shingles(sf_dir: str, k: int = 20) -> "object":
    """Template/boilerplate detector: the top-k 3-token shingles by
    DOCUMENT frequency (distinct docs containing them) with their corpus
    penetration in ppm — the triage list a curation pipeline turns into a
    strip-list (headers, footers, license blurbs share shingles across
    thousands of docs; organic text doesn't).  Same shingle construction
    as the MinHash pipeline, so the list explains exactly what inflates
    LSH buckets.

    Distributed shape: per-doc shingle sets are batch-local, so one
    map-side combiner emits (shingle, df) partials into a Heaps-bounded
    vocabulary groupby + sort/limit; the ppm is integer floor on both
    engines.  Output: (shingle, df, df_ppm)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in t.column("text").to_pylist():
            c.update(_shingles(text))
        toks = list(c.keys())
        return pa.table(
            {
                "shingle": pa.array(toks, pa.string()),
                "df_p": pa.array([c[x] for x in toks], pa.int64()),
            }
        )

    top = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shingle")
        .aggregate(Sum("df_p", alias_name="df"))
        .sort(["df", "shingle"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "shingle": top["shingle"].astype(str),
            "df": top["df"].astype("int64"),
            "df_ppm": (top["df"].astype("int64") * 1_000_000 // n_docs).astype("int64"),
        }
    )
    return out.reset_index(drop=True)


BOILERPLATE_SHINGLES_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN []
              WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(range(1, len(toks) - 3 + 2),
                                 i -> array_to_string(toks[i:i+2], ' ')))
         END AS shingles
  FROM t
), sv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), df AS (
  SELECT s AS shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sv GROUP BY 1
)
SELECT shingle, df,
       CAST(df * 1000000 // (SELECT COUNT(*) FROM documents) AS BIGINT) AS df_ppm
FROM df ORDER BY df DESC, shingle LIMIT 20
"""


# -- duplicate token inflation --------------------------------------------------


def dup_token_inflation(sf_dir: str) -> "object":
    """The dedup ROI number a curation run is judged by: what fraction of
    the corpus's TOKEN mass is redundant — tokens of near-dup-cluster
    members beyond each cluster's canonical keeper (min doc_id) — i.e. the
    training-token savings of applying ``dedup_keep_list``'s near-dup rule.
    Output: one row (total_tokens, clustered_tokens, redundant_tokens,
    inflation_ppm), integer floor ppm.

    Distributed shape: rides the memoized ``dedup_clusters`` components;
    one doc-bucket co-location attaches per-doc token counts to cluster
    rows (and folds each bucket's total-token partial in the same kernel),
    then a rep-bucket co-location folds per-bucket (clustered, keeper)
    sums — the driver sees O(buckets) scalars, never per-cluster rows."""
    import pandas as pd

    nb = _corpus_buckets(sf_dir)
    clusters = dedup_clusters(sf_dir)

    def tok_rows(t: pa.Table) -> pd.DataFrame:
        n = [
            len(TOKEN_RE.findall(x.lower()))
            for x in t.column("text").to_pylist()
        ]
        doc = t.column("doc_id").to_pylist()
        return pd.DataFrame(
            {
                "gb": pd.Series([d % nb for d in doc], dtype="int32"),
                "doc_id": pd.Series(doc, dtype="int64"),
                "rep": pd.Series([-1] * len(doc), dtype="int64"),
                "n": pd.Series(n, dtype="int64"),
                "kind": pd.Series([0] * len(doc), dtype="int8"),
            }
        )

    def cl_rows(t: pd.DataFrame) -> pd.DataFrame:
        d = t["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "gb": (d % nb).astype("int32"),
                "doc_id": d,
                "rep": t["cluster_rep"].astype("int64"),
                "n": pd.Series([0] * len(t), dtype="int64"),
                "kind": pd.Series([1] * len(t), dtype="int8"),
            }
        )

    u = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(tok_rows, batch_format="pyarrow")
        .union(clusters.map_batches(cl_rows, batch_format="pandas"))
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        toks = g[g["kind"] == 0]
        cl = g[g["kind"] == 1]
        n_map = toks.set_index("doc_id")["n"]
        out = {
            "rb": [int(g["gb"].iloc[0])],
            "rep": [-1],
            "n": [int(toks["n"].sum())],
            "isrep": [0],
            "kind": [9],  # bucket-total partial
        }
        if len(cl):
            att = cl["doc_id"].map(n_map).fillna(0).astype("int64")
            out["rb"] = [int(x) for x in (cl["rep"] % nb)] + out["rb"]
            out["rep"] = [int(x) for x in cl["rep"]] + out["rep"]
            out["n"] = [int(x) for x in att] + out["n"]
            out["isrep"] = [
                int(a == b) for a, b in zip(cl["doc_id"], cl["rep"])
            ] + out["isrep"]
            out["kind"] = [0] * len(cl) + out["kind"]
        return pd.DataFrame(
            {
                "rb": pd.Series(out["rb"], dtype="int32"),
                "rep": pd.Series(out["rep"], dtype="int64"),
                "n": pd.Series(out["n"], dtype="int64"),
                "isrep": pd.Series(out["isrep"], dtype="int8"),
                "kind": pd.Series(out["kind"], dtype="int8"),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cl = g[g["kind"] == 0]
        return pd.DataFrame(
            {
                "c_sum": pd.Series([int(cl["n"].sum())], dtype="int64"),
                "r_sum": pd.Series(
                    [int(cl.loc[cl["isrep"] == 1, "n"].sum())], dtype="int64"
                ),
                "t_sum": pd.Series(
                    [int(g.loc[g["kind"] == 9, "n"].sum())], dtype="int64"
                ),
            }
        )

    parts = (
        u.groupby("gb")
        .map_groups(attach, batch_format="pandas")
        .groupby("rb")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # O(buckets)
    )
    total = int(parts["t_sum"].sum())
    clustered = int(parts["c_sum"].sum())
    keeper = int(parts["r_sum"].sum())
    redundant = clustered - keeper
    return pd.DataFrame(
        {
            "total_tokens": pd.Series([total], dtype="int64"),
            "clustered_tokens": pd.Series([clustered], dtype="int64"),
            "redundant_tokens": pd.Series([redundant], dtype="int64"),
            "inflation_ppm": pd.Series(
                [redundant * 1_000_000 // total if total else 0], dtype="int64"
            ),
        }
    )


DUP_TOKEN_INFLATION_SQL = f"""
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
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_rep
  FROM reach GROUP BY a
),
tok AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n
  FROM documents
),
agg AS (
  SELECT (SELECT SUM(n) FROM tok) AS total,
         (SELECT SUM(t.n) FROM clusters c JOIN tok t USING (doc_id))
           AS clustered,
         (SELECT SUM(t.n) FROM clusters c JOIN tok t USING (doc_id)
          WHERE c.doc_id = c.cluster_rep) AS keeper
)
SELECT CAST(total AS BIGINT) AS total_tokens,
       CAST(clustered AS BIGINT) AS clustered_tokens,
       CAST(clustered - keeper AS BIGINT) AS redundant_tokens,
       CAST((clustered - keeper) * 1000000 // total AS BIGINT)
         AS inflation_ppm
FROM agg
"""


# -- ER name clusters -----------------------------------------------------------


def name_clusters(sf_dir: str) -> "object":
    """Entity-resolution CLUSTERS over the edit-distance-1 name graph —
    the step after ``fuzzy_name_pairs`` a record-linkage pipeline actually
    consumes: connected components of the typo graph, reported as the
    cluster-size histogram (cluster_size, n_clusters) so the output stays
    bounded by the largest typo family at any corpus size.  Names map to
    int64 node ids via md5_64(name) >> 1 (collision-free in practice and
    replayed exactly by the oracle), then the shared alternating
    large-star/small-star ``label_components`` machinery runs unchanged —
    its second production consumer after the MinHash doc graph.

    Size fold: one lbl-bucket co-location counts members per component and
    folds to (size, n) partials in-kernel, so the exchange after the CC
    iteration is O(max_cluster_size) rows per bucket."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    pairs = fuzzy_name_pairs(sf_dir)

    def to_ids(t: pd.DataFrame) -> pd.DataFrame:
        def h(s: pd.Series) -> pd.Series:
            return pd.Series(
                [_hash64(x.encode()) >> 1 for x in s], dtype="int64"
            )

        return pd.DataFrame({"a": h(t["name_a"]), "b": h(t["name_b"])})

    labels = label_components(
        pairs.map_batches(to_ids, batch_format="pandas"), "a", "b"
    )
    import pyarrow.parquet as pq

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows)

    def bucket(t: pd.DataFrame) -> pd.DataFrame:
        lbl = t["lbl"].astype("int64")
        return pd.DataFrame({"gb": (lbl % nb).astype("int32"), "lbl": lbl})

    def size_partials(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("lbl", sort=False).size()
        hist = sizes.value_counts()
        return pd.DataFrame(
            {
                "cluster_size": hist.index.astype("int64"),
                "n_p": hist.to_numpy().astype("int64"),
            }
        )

    out = (
        labels.map_batches(bucket, batch_format="pandas")
        .groupby("gb")
        .map_groups(size_partials, batch_format="pandas")
        .groupby("cluster_size")
        .aggregate(Sum("n_p", alias_name="n_clusters"))
        .to_pandas()  # O(max cluster size)
        .sort_values("cluster_size")
        .reset_index(drop=True)
    )
    out["cluster_size"] = out["cluster_size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    return out


NAME_CLUSTERS_SQL = f"""
WITH RECURSIVE fpairs AS (
{FUZZY_NAME_PAIRS_SQL.replace("ORDER BY name_a, name_b", "")}
),
ids AS (
  SELECT CAST(CAST(concat('0x', substr(md5(name_a), 1, 16)) AS UBIGINT)
              // 2 AS BIGINT) AS a,
         CAST(CAST(concat('0x', substr(md5(name_b), 1, 16)) AS UBIGINT)
              // 2 AS BIGINT) AS b
  FROM fpairs
),
edges AS (
  SELECT a, b FROM ids UNION SELECT b, a FROM ids
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS lbl FROM reach GROUP BY a
),
sizes AS (
  SELECT lbl, COUNT(*) AS cluster_size FROM comp GROUP BY lbl
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""


# -- cross-modality duplicate-agreement audit ------------------------------------


def dup_modality_agreement(sf_dir: str) -> "object":
    """Cross-MODALITY near-duplicate agreement audit: how much do the
    text dedup signal (MinHash-LSH verified Jaccard >= 0.5 pairs) and
    the embedding signal (exact cosine >= 0.42 pairs, vec_id == doc_id)
    agree?  Low agreement means the two dedup stages catch DIFFERENT
    duplicate populations and a production pipeline should run both —
    the QA measurement behind that decision.  Composes the two existing
    SQL-oracled pair miners; the intersection rides one pair-bucket
    co-location (both pair sets are output-proportional), so the driver
    sees three scalars.  Output: (n_text_pairs, n_vec_pairs, n_both)."""
    import zlib

    import pandas as pd

    from ray.data.aggregate import Sum

    from ..functions import similarity as _sim
    from ._util import n_buckets
    import pyarrow.parquet as pq_

    nb = n_buckets(
        pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )

    mh = minhash_lsh_pairs(sf_dir)
    cs = _sim.cosine_dup_pairs(sf_dir)

    def tag(src_bit: int, ca: str, cb: str):
        def _t(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            a = pc.cast(t[ca], pa.int64()).to_pylist()
            b = pc.cast(t[cb], pa.int64()).to_pylist()
            bk = [
                zlib.crc32(f"{x}-{y}".encode()) % nb for x, y in zip(a, b)
            ]
            return pa.table(
                {
                    "bk": pa.array(bk, pa.int32()),
                    "a": pa.array(a, pa.int64()),
                    "b": pa.array(b, pa.int64()),
                    "bit": pa.array([src_bit] * len(a), pa.int64()),
                }
            )

        return _t

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        agg = g.groupby(["a", "b"])["bit"].sum()
        # exclusive cells: 1 = text only, 2 = vec only, 3 = both
        return pd.DataFrame(
            {
                "n_text": pd.Series([int((agg == 1).sum())], dtype="int64"),
                "n_vec": pd.Series([int((agg == 2).sum())], dtype="int64"),
                "n_both": pd.Series([int((agg == 3).sum())], dtype="int64"),
            }
        )

    parts = (
        mh.map_batches(tag(1, "doc_a", "doc_b"), batch_format="pyarrow")
        .union(
            cs.map_batches(tag(2, "vec_a", "vec_b"), batch_format="pyarrow")
        )
        .groupby("bk")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # one row per bucket
    )
    return pd.DataFrame(
        {
            "n_text_pairs": [int(parts["n_text"].sum())
                             + int(parts["n_both"].sum())],
            "n_vec_pairs": [int(parts["n_vec"].sum())
                            + int(parts["n_both"].sum())],
            "n_both": [int(parts["n_both"].sum())],
        }
    ).astype("int64")


DUP_MODALITY_AGREEMENT_SQL = (
    "WITH mh AS ("
    + MINHASH_LSH_SQL.replace("ORDER BY doc_a, doc_b", "")
    + """), cs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42
)
SELECT CAST((SELECT COUNT(*) FROM mh) AS BIGINT) AS n_text_pairs,
       CAST((SELECT COUNT(*) FROM cs) AS BIGINT) AS n_vec_pairs,
       CAST((SELECT COUNT(*) FROM mh JOIN cs
             ON mh.doc_a = cs.vec_a AND mh.doc_b = cs.vec_b) AS BIGINT)
         AS n_both
"""
)
