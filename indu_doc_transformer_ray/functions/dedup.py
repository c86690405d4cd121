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
import zlib

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


def _shingles(text: str) -> set[str]:
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < SHINGLE_K:
        return {" ".join(toks)} if toks else set()
    return {
        " ".join(toks[i : i + SHINGLE_K])
        for i in range(len(toks) - SHINGLE_K + 1)
    }


def _minhash_sig(sh: set[str]) -> list[int]:
    """MinHash signature (Broder, "On the resemblance and containment of
    documents", 1997): per-salt minimum of crc32 over the shingle set —
    crc32 rather than hash() for cross-process determinism."""
    sig = []
    for salt in range(N_HASHES):
        best = None
        prefix = f"{salt}:".encode()
        for s in sh:
            v = zlib.crc32(prefix + s.encode())
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


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5) -> "object":
    """Near-duplicate pairs: banded MinHash candidate generation (the LSH
    groupby) followed by exact shingle-Jaccard verification of ONLY the
    candidate documents, fetched via a broadcast semi-join (`ray.put` of the
    candidate-id set, vectorized `is_in` filter over the corpus — the
    ray_guide semi-join pattern).  LSH keeps the candidate set tiny relative
    to the corpus, which is exactly what makes the semi-join the
    scale-correct shape.  Returns (doc_a, doc_b, jaccard_permille)."""
    import pandas as pd
    import ray as _ray

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(
        MinHashBands, batch_format="pyarrow", concurrency=(1, 4)
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"]))
        rows = [
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        ]
        return pd.DataFrame(
            {
                "doc_a": pd.Series([r[0] for r in rows], dtype="int64"),
                "doc_b": pd.Series([r[1] for r in rows], dtype="int64"),
            }
        )

    pair_rows = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))  # dedup candidate pairs
        .select_columns(["doc_a", "doc_b"])
        .take_all()
    )
    pairs = sorted((r["doc_a"], r["doc_b"]) for r in pair_rows)
    cand_ids = sorted({d for p in pairs for d in p})
    ref = _ray.put(set(cand_ids))

    def cand_shingles(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(ref)
        mask = pc.is_in(
            batch.column("doc_id"),
            value_set=pa.array(list(wanted), pa.int64()),
        )
        sub = batch.filter(mask)
        out = [
            "\x1e".join(sorted(_shingles(t)))
            for t in sub.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": sub.column("doc_id"),
                "shingles": pa.array(out, pa.string()),
            }
        )

    sh_rows = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(cand_shingles, batch_format="pyarrow")
        .take_all()
    )
    sh = {
        r["doc_id"]: set(r["shingles"].split("\x1e")) if r["shingles"] else set()
        for r in sh_rows
    }

    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        A, B = sh.get(a, set()), sh.get(b, set())
        inter = len(A & B)
        union = len(A) + len(B) - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(int(j * 1000))
    return pd.DataFrame(
        {
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "jaccard_permille": pd.Series(out_j, dtype="int64"),
        }
    )


# -- SimHash ----------------------------------------------------------------

def simhash64(sf_dir: str) -> Dataset:
    """64-bit SimHash per document (token-unigram features, md5 bit mixing);
    near-dups differ in few bits.  Deterministic, rows-only oracle."""

    # Charikar, "Similarity estimation techniques from rounding algorithms",
    # STOC 2002 — the sign-of-weighted-feature-hash construction.
    def sim(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            acc = [0] * 64
            from collections import Counter

            for tok, w in Counter(toks).items():
                h = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big"
                )
                for bit in range(64):
                    acc[bit] += w if (h >> bit) & 1 else -w
            v = 0
            for bit in range(64):
                if acc[bit] > 0:
                    v |= 1 << bit
            # two's-complement into signed int64 for Arrow
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "simhash": pa.array(out, pa.int64())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        sim, batch_format="pyarrow"
    )


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
