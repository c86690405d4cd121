"""Deduplication operators over the ``documents`` table.

Scale pattern per op (ray_guide 'Aggregation at scale' / SURVEY.md):

- exact dedup: content-hash column in a vectorized map_batches, then
  ``groupby(hash).aggregate(Min(doc_id))`` — a single uniform-key shuffle.
- MinHash+LSH near-dup: shingle -> minhash signature per batch -> explode to
  (band_id, band_hash, doc_id) rows -> groupby bands -> candidate pairs ->
  exact-Jaccard verification of candidate docs via a broadcast semi-join
  (candidates << corpus by construction).
- SimHash: 64-bit signature per document, vectorized per batch.
- n-gram Jaccard: exact all-pairs on a bounded subset (the verification-side
  primitive; LSH is the scale path for candidate generation).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Min

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")


def _read_docs(sf_dir: str, columns: list[str]) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# -- exact dedup ------------------------------------------------------------

def dedup_exact(sf_dir: str) -> Dataset:
    """Keep the minimum doc_id per exact text; returns the kept doc ids with
    their group size (hash-partition + per-group-first, SURVEY graft spec)."""

    def hash_text(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "h": pa.array(h, pa.string())}
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(hash_text, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("doc_id", alias_name="keep_doc_id"),
            Count(alias_name="group_size"),
        )
        .select_columns(["keep_doc_id", "group_size"])
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

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(key, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Min("doc_id", alias_name="keep_doc_id"),
            Count(alias_name="group_size"),
        )
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


def _minhash_sig(sh: set[str]) -> list[int]:
    """MinHash signature (Broder, "On the resemblance and containment of
    documents", 1997): per-salt minimum of a salted 64-bit md5 over the
    shingle set — md5 (not crc32/hash()) for cross-process AND cross-engine
    determinism."""
    sig = []
    for salt in range(N_HASHES):
        best = None
        prefix = f"{salt}:".encode()
        for s in sh:
            v = _hash64(prefix + s.encode())
            if best is None or v < best:
                best = v
        sig.append(best if best is not None else 0)
    return sig


class MinHashBands:
    """Actor stage: documents -> (band_id, band_hash, doc_id) rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = _minhash_sig(_shingles(text))
            for b in range(BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                band_ids.append(b)
                band_hashes.append(
                    hashlib.md5(
                        (",".join(map(str, chunk))).encode()
                    ).hexdigest()
                )
                doc_ids.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
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
    Candidates/pairs never materialize on the driver."""
    import logging

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(MinHashBands(), batch_format="pyarrow")

    log = logging.getLogger(__name__)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        if len(ids) > MAX_BUCKET:
            dropped = (
                len(ids) * (len(ids) - 1) - MAX_BUCKET * (MAX_BUCKET - 1)
            ) // 2
            log.warning(
                "LSH bucket capped: %d members -> %d, ~%d candidate pairs dropped",
                len(ids), MAX_BUCKET, dropped,
            )
            ids = ids[:MAX_BUCKET]
        rows = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pa.table(
            {
                "doc_a": pa.array([r[0] for r in rows], pa.int64()),
                "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    raw_pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )

    shingle_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        ShingleSets(), batch_format="pyarrow"
    )

    # round A: co-locate each pair with doc_a's shingle set.
    # unified schema: (k, other, sh_carry, sh, is_pair)
    def pairs_r1(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("doc_a"),
                "other": t.column("doc_b"),
                "sh_carry": pa.array([""] * n, pa.string()),
                "sh": pa.array([""] * n, pa.string()),
                "is_pair": pa.array([1] * n, pa.int32()),
            }
        )

    def sh_r1(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("doc_id"),
                "other": pa.array([-1] * n, pa.int64()),
                "sh_carry": pa.array([""] * n, pa.string()),
                "sh": t.column("shingles"),
                "is_pair": pa.array([0] * n, pa.int32()),
            }
        )

    u1 = raw_pairs.map_batches(pairs_r1, batch_format="pyarrow").union(
        shingle_ds.map_batches(sh_r1, batch_format="pyarrow")
    )

    def attach_a(g: pa.Table) -> pa.Table:
        is_pair = g.column("is_pair").to_pylist()
        sh_a = ""
        for flag, sh in zip(is_pair, g.column("sh").to_pylist()):
            if flag == 0:
                sh_a = sh
                break
        doc_a = g.column("k")[0].as_py()
        doc_bs = sorted(
            {o for flag, o in zip(is_pair, g.column("other").to_pylist()) if flag}
        )  # in-group dedup of the multi-band candidate multiset
        return pa.table(
            {
                "k": pa.array(doc_bs, pa.int64()),  # re-key by doc_b
                "other": pa.array([doc_a] * len(doc_bs), pa.int64()),
                "sh_carry": pa.array([sh_a] * len(doc_bs), pa.string()),
                "sh": pa.array([""] * len(doc_bs), pa.string()),
                "is_pair": pa.array([1] * len(doc_bs), pa.int32()),
            }
        )

    r1 = u1.groupby("k").map_groups(attach_a, batch_format="pyarrow")

    # round B: co-locate with doc_b's shingle set and verify in-group
    u2 = r1.union(shingle_ds.map_batches(sh_r1, batch_format="pyarrow"))

    def verify_b(g: pa.Table) -> pa.Table:
        is_pair = g.column("is_pair").to_pylist()
        sh_b_raw = ""
        for flag, sh in zip(is_pair, g.column("sh").to_pylist()):
            if flag == 0:
                sh_b_raw = sh
                break
        B = set(sh_b_raw.split("\x1e")) if sh_b_raw else set()
        doc_b = g.column("k")[0].as_py()
        out_a, out_j = [], []
        for flag, doc_a, sh_a_raw in zip(
            is_pair, g.column("other").to_pylist(),
            g.column("sh_carry").to_pylist(),
        ):
            if not flag:
                continue
            A = set(sh_a_raw.split("\x1e")) if sh_a_raw else set()
            inter = len(A & B)
            union = len(A) + len(B) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(doc_a)
                out_j.append(int(j * 1000))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array([doc_b] * len(out_a), pa.int64()),
                "jaccard_permille": pa.array(out_j, pa.int64()),
            }
        )

    out = u2.groupby("k").map_groups(verify_b, batch_format="pyarrow")
    return out.sort(["doc_a", "doc_b"])


# DuckDB mirror of the full MinHash+LSH pipeline (possible because the hash
# is md5-based): shingle sets -> 16 salted min-hashes -> 8 banded md5 bucket
# keys -> in-bucket pairs -> exact-Jaccard verification at the threshold.
MINHASH_LSH_SQL = """
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
), hv AS (
  SELECT doc_id, salt,
         MIN(CAST(concat('0x', substr(md5(concat(CAST(salt AS VARCHAR), ':', s)), 1, 16)) AS UBIGINT)) AS m
  FROM sv CROSS JOIN (SELECT unnest(range(16)) AS salt) GROUP BY doc_id, salt
), sig AS (
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
), j AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
           / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jac
  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b
  WHERE len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) > 0
)
SELECT doc_a, doc_b, CAST(FLOOR(jac * 1000) AS BIGINT) AS jaccard_permille
FROM j WHERE jac >= 0.5 ORDER BY doc_a, doc_b
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
        SimHash64, batch_format="pyarrow", concurrency=(1, 4)
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
