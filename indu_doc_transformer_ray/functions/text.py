"""Text-analysis operators over the ``documents`` table.

Everything is a vectorized-per-batch ``map_batches`` stage with compiled
regexes held in actor state where the stage is stateful; integer outputs
where a DuckDB oracle mirrors the op (float ratios would hash-differ).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
STOPWORDS = ("the", "a", "of", "and", "to")

#: Tiny per-language stopword profiles for the heuristic language-ID stage.
LANG_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "is"},
    "de": {"der", "die", "das", "und", "ist"},
    "fr": {"le", "la", "et", "est", "un"},
    "es": {"el", "la", "y", "es", "un"},
    "zh": set(),  # no-latin-stopword fallback
}


def _read_docs(sf_dir: str, columns: list[str]) -> Dataset:
    from ._util import read_small_aware

    return read_small_aware(f"{sf_dir}/documents.parquet", columns=columns)


class TokenStats:
    """Stateful stage: compiled token regex + stopword set in actor state."""

    def __init__(self):
        self.token_re = re.compile(r"[A-Za-z0-9_]+")
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tokens, n_uniq, n_stop, n_chars = [], [], [], []
        for text in batch.column("text").to_pylist():
            toks = self.token_re.findall(text.lower())
            n_tokens.append(len(toks))
            n_uniq.append(len(set(toks)))
            n_stop.append(sum(1 for t in toks if t in self.stop))
            n_chars.append(len(text))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        )


def token_stats(sf_dir: str) -> Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        TokenStats, batch_format="pyarrow", concurrency=(1, 4)
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))) AS BIGINT) AS n_uniq_tokens,
       CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                x -> x IN {STOPWORDS})) AS BIGINT) AS n_stopwords,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def doc_fingerprint(sf_dir: str) -> Dataset:
    """Whitespace-normalized lowercase md5 fingerprint per document (the
    exact-dedup key at scale)."""

    def fp(batch: pa.Table) -> pa.Table:
        out = [
            hashlib.md5(
                " ".join(TOKEN_RE.findall(t.lower())).encode()
            ).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "fingerprint": pa.array(out, pa.string())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ')) AS fingerprint
FROM documents
"""


def winnow_fingerprint(sf_dir: str) -> Dataset:
    """Winnowing fingerprint (Schleimer, Wilkerson, Aiken — "Winnowing:
    local algorithms for document fingerprinting", SIGMOD 2003): k-gram
    hashes, per-window minima with run collapsing, fingerprint = md5 of the
    minima sequence.  Deterministic; no SQL equivalent (rows-only check)."""
    K, W = 5, 4

    def fp(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            grams = [
                int.from_bytes(
                    hashlib.md5(" ".join(toks[i : i + K]).encode()).digest()[:8],
                    "big",
                )
                for i in range(max(0, len(toks) - K + 1))
            ]
            if not grams:
                out.append("")
                continue
            mins = [
                min(grams[i : i + W]) for i in range(max(1, len(grams) - W + 1))
            ]
            # collapse runs (classic winnowing keeps each minimum once)
            kept = [m for i, m in enumerate(mins) if i == 0 or m != mins[i - 1]]
            out.append(
                hashlib.md5(",".join(map(str, kept)).encode()).hexdigest()
            )
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "winnow_fp": pa.array(out, pa.string())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


# DuckDB mirror of the winnowing construction: 5-gram 64-bit md5 hashes,
# 4-wide window minima (windows clipped to the python impl's
# max(1, len(grams)-W+1) count), run-collapse via lag(), md5 of the
# comma-joined decimal minima.
WINNOW_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 16)) AS UBIGINT) AS g
  FROM t, unnest(range(1, greatest(len(toks) - 5 + 1, 0) + 1)) AS u(i)
), mins AS (
  SELECT doc_id, i,
         MIN(g) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         MAX(i) OVER (PARTITION BY doc_id) AS max_i
  FROM grams
), win AS (
  SELECT doc_id, i, m FROM mins WHERE i <= greatest(1, max_i - 3)
), collapsed AS (
  SELECT doc_id, i, m,
         CASE WHEN lag(m) OVER (PARTITION BY doc_id ORDER BY i) = m
              THEN 0 ELSE 1 END AS keep
  FROM win
), agg AS (
  SELECT doc_id, md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS winnow_fp
  FROM collapsed WHERE keep = 1 GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(agg.winnow_fp, '') AS winnow_fp
FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""


class LangId:
    """Heuristic n-gram/stopword language scorer (actor-pool stage; the
    profiles are tiny here but stand in for a real fasttext-style model
    loaded once per actor)."""

    def __init__(self):
        self.token_re = re.compile(r"[A-Za-z0-9_]+")
        self.profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch.column("text").to_pylist():
            toks = set(self.token_re.findall(text.lower()))
            best_lang, best = "und", -1
            for lang in sorted(self.profiles):
                s = len(toks & self.profiles[lang])
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
            scores.append(best)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, pa.string()),
                "score": pa.array(scores, pa.int64()),
            }
        )


def lang_id(sf_dir: str) -> Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )


def _lang_profile_values() -> str:
    """LANG_PROFILES as a SQL VALUES list, so the oracle and the actor can
    never drift."""
    return ", ".join(
        "('%s', [%s])" % (lang, ", ".join("'%s'" % w for w in sorted(ws)))
        for lang, ws in sorted(LANG_PROFILES.items())
    )


# Stopword-overlap argmax with the LangId actor's tie-break (first lang in
# sorted order wins on equal score — row_number ORDER BY s DESC, lang).
LANG_ID_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
  FROM documents
), profiles(lang, words) AS (VALUES {_lang_profile_values()}),
scores AS (
  SELECT doc_id, lang, len(list_intersect(w, words)) AS s
  FROM toks CROSS JOIN profiles
)
SELECT doc_id, lang AS pred_lang, CAST(s AS BIGINT) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn
      FROM scores)
WHERE rn = 1 ORDER BY doc_id
"""


def lang_dist(sf_dir: str) -> Dataset:
    from ray.data.aggregate import Count

    return (
        _read_docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))
    )


LANG_DIST_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
"""


def vocab_topk(sf_dir: str, k: int = 50) -> Dataset:
    """Corpus-wide top-k terms: per-batch partial token counts (Arrow
    ``group_by`` inside map_batches — the combiner) feed a small global
    groupby over the VOCABULARY (not the corpus), then sort+limit.
    Deterministic tie-break (count desc, token asc) mirrored in the oracle."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for text in t.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(text.lower()))
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


VOCAB_TOPK_SQL = """
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
      FROM documents)
GROUP BY tok ORDER BY n DESC, tok LIMIT 50
"""


def doclen_percentiles(sf_dir: str) -> "object":
    """Exact token-length percentiles (p25/50/75/90/99) over the corpus via
    the scale-safe histogram fold: a groupby over DISTINCT lengths (bounded
    by the value domain, not the corpus) comes to the driver as a tiny
    table; the percentile index math is integer-exact on both engines
    (k = (N-1)*pct // 100, lower discrete quantile)."""
    import pandas as pd

    from ray.data.aggregate import Count

    def lengths(t: pa.Table) -> pa.Table:
        n = [len(TOKEN_RE.findall(x.lower())) for x in t.column("text").to_pylist()]
        return pa.table({"n_tokens": pa.array(n, pa.int64())})

    hist = (
        _read_docs(sf_dir, ["text"])
        .map_batches(lengths, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()  # one row per DISTINCT length — O(domain), not O(docs)
        .sort_values("n_tokens")
        .reset_index(drop=True)
    )
    total = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum()
    rows = []
    for pct in (25, 50, 75, 90, 99):
        k = (total - 1) * pct // 100
        val = int(hist["n_tokens"][cum > k].iloc[0])
        rows.append((pct, val))
    return pd.DataFrame(rows, columns=["pct", "n_tokens"]).astype(
        {"pct": "int64", "n_tokens": "int64"}
    )


DOCLEN_PERCENTILES_SQL = """
WITH l AS (
  SELECT len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n FROM documents
), o AS (
  SELECT n, row_number() OVER (ORDER BY n) - 1 AS rn FROM l
), c AS (SELECT COUNT(*) AS total FROM l)
SELECT CAST(p.pct AS BIGINT) AS pct, CAST(o.n AS BIGINT) AS n_tokens
FROM (VALUES (25), (50), (75), (90), (99)) p(pct)
JOIN c ON true
JOIN o ON o.rn = (c.total - 1) * p.pct // 100
ORDER BY pct
"""


def stratified_sample(sf_dir: str, per_lang: int = 3) -> Dataset:
    """Deterministic stratified sample: the ``per_lang`` lowest
    ``md5(doc_id)``-ranked documents of every language — the reproducible
    per-stratum sampler (hash rank, not RNG, so re-runs and engines agree).
    Bounded-heap shape: each batch prunes locally to ``per_lang`` rows per
    language BEFORE the shuffle, so the per-language fold sees at most
    per_lang x n_blocks candidates — a hot language never co-locates its
    full stratum in one task."""
    import pandas as pd

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hk = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        local = (
            pd.DataFrame(
                {
                    "lang": t.column("lang").to_pylist(),
                    "doc_id": pd.array(ids, dtype="int64"),
                    "hk": hk,
                }
            )
            .sort_values(["lang", "hk", "doc_id"])
        )
        local = local[local.groupby("lang").cumcount() < per_lang]
        return pa.table(
            {
                "lang": pa.array(local["lang"], pa.string()),
                "doc_id": pa.array(local["doc_id"], pa.int64()),
                "hk": pa.array(local["hk"], pa.string()),
            }
        )

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "hk", "doc_id"])
        g = g.assign(rk=g.groupby("lang").cumcount() + 1)
        g = g[g["rk"] <= per_lang]
        return pd.DataFrame(
            {
                "lang": g["lang"].values,
                "doc_id": g["doc_id"].astype("int64").values,
                "rk": g["rk"].astype("int64").values,
            }
        )

    # languages are a tiny domain -> one group per language is already
    # coarse; groupby directly on lang
    return (
        _read_docs(sf_dir, ["doc_id", "lang"])
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topn, batch_format="pandas")
    )


STRATIFIED_SAMPLE_SQL = """
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= 3
"""


def doclen_percentiles_by_lang(sf_dir: str) -> "object":
    """Exact token-length percentiles (p50/p90) PER LANGUAGE stratum — the
    grouped variant of ``doclen_percentiles``: one groupby over distinct
    (lang, length) pairs (O(strata x domain), not O(docs)), folded to
    per-stratum discrete quantiles with integer-exact index math."""
    import pandas as pd

    from ray.data.aggregate import Count

    def lengths(t: pa.Table) -> pa.Table:
        n = [len(TOKEN_RE.findall(x.lower())) for x in t.column("text").to_pylist()]
        return pa.table(
            {"lang": t.column("lang"), "n_tokens": pa.array(n, pa.int64())}
        )

    hist = (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(lengths, batch_format="pyarrow")
        .groupby(["lang", "n_tokens"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()  # one row per distinct (lang, length)
    )
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_tokens").reset_index(drop=True)
        total = int(g["cnt"].sum())
        cum = g["cnt"].cumsum()
        for pct in (50, 90):
            k = (total - 1) * pct // 100
            val = int(g["n_tokens"][cum > k].iloc[0])
            rows.append((lang, pct, val))
    return pd.DataFrame(rows, columns=["lang", "pct", "n_tokens"]).astype(
        {"pct": "int64", "n_tokens": "int64"}
    ).sort_values(["lang", "pct"]).reset_index(drop=True)


DOCLEN_BY_LANG_SQL = """
WITH l AS (
  SELECT lang, len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n
  FROM documents
), o AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang ORDER BY n) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS total
  FROM l
)
SELECT lang, CAST(p.pct AS BIGINT) AS pct, CAST(o.n AS BIGINT) AS n_tokens
FROM (VALUES (50), (90)) p(pct)
JOIN o ON o.rn = (o.total - 1) * p.pct // 100
ORDER BY lang, pct
"""


def tfidf_top_terms(sf_dir: str, k: int = 3) -> Dataset:
    """Per-document top-k TF-IDF terms with INTEGER scoring
    (score = tf * ((N*1000) // df) — exact on both engines, no cross-libm
    log), fully distributed and broadcast-free:

    1. map_batches emits (doc_id, token, tf) rows (docs are row-atomic, so
       per-doc tf needs no shuffle);
    2. df = groupby(token) count over those rows (vocabulary-sized);
    3. df attaches back to the tf rows via union + bucketed-token groupby
       co-location (the repartition join — the vocabulary is NOT broadcast:
       at open-web scale it outgrows a worker);
    4. per-doc top-k via a bucketed-doc groupby with a vectorized in-group
       sort (score desc, term asc — deterministic ties).
    """
    import pandas as pd

    from ray.data.aggregate import Count

    n_docs = __import__("pyarrow.parquet", fromlist=["read_metadata"]).read_metadata(
        f"{sf_dir}/documents.parquet"
    ).num_rows
    # the dominant shuffled table is the (doc, distinct token) tf rows:
    # ~200 distinct tokens per web doc -> derive the bucket count from that
    # estimate instead of a fixed 512 (corpus/512-sized tasks at 10^12 docs)
    from ._util import n_buckets

    BUCKETS = n_buckets(n_docs * 200)

    def _tok_bucket(tok: str) -> int:
        # deterministic cross-process bucketing (builtin hash() is
        # PYTHONHASHSEED-randomized and differs between Ray workers)
        import zlib

        return zlib.crc32(tok.encode()) % BUCKETS

    def tf_rows(t: pa.Table) -> pa.Table:
        from collections import Counter

        doc_ids, toks, tfs = [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            for tok, tf in Counter(TOKEN_RE.findall(text.lower())).items():
                doc_ids.append(doc_id)
                toks.append(tok)
                tfs.append(tf)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tf = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(tf_rows, batch_format="pyarrow")
    )
    df = tf.groupby("token").aggregate(Count(alias_name="df"))

    # co-locate tf rows with their token's df row.  Both union sides emit
    # ARROW (a union rejects MIXED block types; all-arrow also dodges the
    # ~13x pandas penalty through the two gb shuffles — BASELINE note)
    def tf_u(t: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "gb": pa.array(
                    t["token"].map(_tok_bucket).astype("int32").values
                ),
                "token": pa.array(t["token"].values, pa.string()),
                "doc_id": pa.array(t["doc_id"].astype("int64").values),
                "tf": pa.array(t["tf"].astype("int64").values),
                "df": pa.array([0] * len(t), pa.int64()),
            }
        )

    def df_u(t: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "gb": pa.array(
                    t["token"].map(_tok_bucket).astype("int32").values
                ),
                "token": pa.array(t["token"].values, pa.string()),
                "doc_id": pa.array([-1] * len(t), pa.int64()),
                "tf": pa.array([0] * len(t), pa.int64()),
                "df": pa.array(t["df"].astype("int64").values),
            }
        )

    u = tf.map_batches(tf_u, batch_format="pandas").union(
        df.map_batches(df_u, batch_format="pandas")
    )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        df_map = g[g["doc_id"] == -1].set_index("token")["df"]
        rows = g[g["doc_id"] >= 0]
        idf_milli = rows["token"].map(df_map).map(
            lambda d: (n_docs * 1000) // int(d)
        )
        return pa.table(
            {
                "gb": pa.array(
                    (rows["doc_id"] % BUCKETS).astype("int32").values
                ),
                "doc_id": pa.array(rows["doc_id"].astype("int64").values),
                "term": pa.array(rows["token"].values, pa.string()),
                "score": pa.array(
                    (rows["tf"] * idf_milli.values).astype("int64").values
                ),
            }
        )

    scored = u.groupby("gb").map_groups(score, batch_format="pandas")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _doc, grp in g.groupby("doc_id"):
            grp = grp.sort_values(
                ["score", "term"], ascending=[False, True]
            ).head(k)
            grp = grp.assign(rank=range(1, len(grp) + 1))
            out.append(grp[["doc_id", "term", "rank", "score"]])
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "term": pd.Series(dtype="object"),
                    "rank": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="int64"),
                }
            )
        res = pd.concat(out, ignore_index=True)
        res["rank"] = res["rank"].astype("int64")
        return res

    return scored.groupby("gb").map_groups(topk, batch_format="pandas")


TFIDF_TOP_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
    FROM documents
  ) GROUP BY doc_id, tok
), dfs AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT doc_id, tok, tf * ((n.n * 1000) // dfs.df) AS score
  FROM tok JOIN dfs USING (tok) CROSS JOIN n
)
SELECT doc_id, tok AS term, CAST(rk AS BIGINT) AS rank, CAST(score AS BIGINT) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rk
      FROM scored)
WHERE rk <= 3 ORDER BY doc_id, rk
"""


def quality_flags(sf_dir: str) -> Dataset:
    """Quality scoring with integer outputs so the oracle hashes identically:
    token count, mean-token-length permille (floored), short-doc flag."""

    def flags(batch: pa.Table) -> pa.Table:
        import math

        n_tokens, mtl, short = [], [], []
        for text in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            n_tokens.append(len(toks))
            mtl.append(
                math.floor(sum(map(len, toks)) / len(toks) * 1000) if toks else 0
            )
            short.append(1 if len(text) < 100 else 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "mean_token_len_permille": pa.array(mtl, pa.int64()),
                "is_short": pa.array(short, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        flags, batch_format="pyarrow"
    )


QUALITY_FLAGS_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9_]+')) = 0 THEN 0
            ELSE FLOOR(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                                               x -> length(x)))::DOUBLE
                 / len(regexp_extract_all(lower(text), '[a-z0-9_]+')) * 1000)
       END AS BIGINT) AS mean_token_len_permille,
       CAST(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END AS BIGINT) AS is_short
FROM documents
"""

# -- Gopher-style repetition statistics --------------------------------------

def repetition_stats(sf_dir: str) -> Dataset:
    """Per-document repetition signals (Rae et al., "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher", 2021 — §A1.1.2
    repetition filters): distinct-token and distinct-bigram counts plus the
    count of the most frequent token.  All-integer outputs so the DuckDB
    oracle hashes bit-identically; the downstream filter (e.g. drop docs with
    dup-bigram fraction > 0.2) is one vectorized comparison on these columns.

    Stateless vectorized batch stage — the per-doc token loop is the same
    bounded-cost shape as ``token_stats`` (documents are the row unit)."""
    from collections import Counter

    def stats(batch: pa.Table) -> pa.Table:
        n_tok, n_uniq, max_tok, n_bg, n_uniq_bg = [], [], [], [], []
        for text in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            n_tok.append(len(toks))
            counts = Counter(toks)
            n_uniq.append(len(counts))
            max_tok.append(max(counts.values()) if counts else 0)
            bigrams = list(zip(toks, toks[1:]))
            n_bg.append(len(bigrams))
            n_uniq_bg.append(len(set(bigrams)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
                "max_token_count": pa.array(max_tok, pa.int64()),
                "n_bigrams": pa.array(n_bg, pa.int64()),
                "n_uniq_bigrams": pa.array(n_uniq_bg, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


REPETITION_STATS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, unnest(ws) AS w FROM t
), freq AS (
  SELECT doc_id, w, COUNT(*) AS n FROM tok GROUP BY doc_id, w
), word_stats AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_uniq_tokens,
         CAST(MAX(n) AS BIGINT) AS max_token_count
  FROM freq GROUP BY doc_id
), bg AS (
  -- bigram as a joined string: tokens contain no spaces, so 'a b' is unique
  SELECT doc_id,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bgs
  FROM t
), bg_stats AS (
  SELECT doc_id, CAST(len(bgs) AS BIGINT) AS n_bigrams,
         CAST(len(list_distinct(bgs)) AS BIGINT) AS n_uniq_bigrams
  FROM bg
)
SELECT t.doc_id,
       COALESCE(word_stats.n_tokens, 0) AS n_tokens,
       COALESCE(word_stats.n_uniq_tokens, 0) AS n_uniq_tokens,
       COALESCE(word_stats.max_token_count, 0) AS max_token_count,
       bg_stats.n_bigrams, bg_stats.n_uniq_bigrams
FROM t LEFT JOIN word_stats USING (doc_id) JOIN bg_stats USING (doc_id)
"""


def bigram_topk(sf_dir: str, k: int = 30) -> Dataset:
    """Corpus-wide top-k token bigrams — same combiner shape as
    ``vocab_topk`` (per-batch Counter partials, then a global groupby over
    the BIGRAM VOCABULARY, not the corpus), the co-occurrence primitive for
    collocation/PMI mining.  Bigram rendered as 'a b' (tokens contain no
    spaces).  Deterministic tie-break (count desc, bigram asc)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            counts.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return pa.table(
            {
                "bigram": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )


BIGRAM_TOPK_SQL = """
WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
  FROM t
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30
"""


def oov_stats(sf_dir: str, vocab_k: int = 100) -> Dataset:
    """Out-of-vocabulary counts per doc against the corpus's own top-K
    vocabulary — the KenLM-free stand-in for LM-based quality filtering:
    phase 1 derives the top-K vocab DISTRIBUTED (combiner -> vocab-sized
    groupby -> sort+limit; only K rows land on the driver), phase 2
    broadcasts the K-token set once and counts membership per doc.
    Deterministic vocab tie-break (count desc, token asc) on both sides."""
    vocab_rows = vocab_topk(sf_dir, k=vocab_k).to_pandas()
    vocab = frozenset(vocab_rows["token"])
    import ray as _ray

    ref = _ray.put(vocab)

    def stats(batch: pa.Table) -> pa.Table:
        v = _ray.get(ref)
        n_tok, n_oov = [], []
        for text in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            n_tok.append(len(toks))
            n_oov.append(sum(1 for t in toks if t not in v))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


OOV_STATS_SQL = """
WITH topv AS (
  SELECT tok FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
    FROM documents
  ) GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT 100
), t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), counted AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN topv.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM t LEFT JOIN topv ON t.tok = topv.tok
  GROUP BY t.doc_id
)
SELECT d.doc_id, COALESCE(c.n_tokens, 0) AS n_tokens,
       COALESCE(c.n_oov, 0) AS n_oov
FROM documents d LEFT JOIN counted c USING (doc_id)
"""


def chunk_documents(
    sf_dir: str, chunk_tokens: int = 64, stride: int = 48
) -> Dataset:
    """Fixed-size token chunking with overlap — the training-data prep
    primitive (chunks for embedding/pretraining): each doc flat-maps to
    ceil-covering windows of ``chunk_tokens`` tokens starting every
    ``stride`` (last partial window kept iff it adds tokens).  One batch in,
    many rows out; no shuffle.  Output integers/hashes only:
    (doc_id, chunk_idx, start_token, n_tokens, chunk_hash)."""

    def chunks(batch: pa.Table) -> pa.Table:
        d_ids, idxs, starts, lens, hashes = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            if not toks:
                continue
            ci = 0
            for start in range(0, len(toks), stride):
                window = toks[start : start + chunk_tokens]
                d_ids.append(doc_id)
                idxs.append(ci)
                starts.append(start)
                lens.append(len(window))
                hashes.append(hashlib.md5(" ".join(window).encode()).hexdigest())
                ci += 1
                if start + chunk_tokens >= len(toks):
                    break
        return pa.table(
            {
                "doc_id": pa.array(d_ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "start_token": pa.array(starts, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "chunk_hash": pa.array(hashes, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow"
    )


CHUNK_DOCUMENTS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
), starts AS (
  -- window starts: 0, 48, 96, ... while start < len; stop after the first
  -- window that reaches the end (start + 64 >= len)
  SELECT doc_id, ws, u.s AS start_token
  FROM t, unnest(range(0, greatest(len(ws), 1), 48)) AS u(s)
  WHERE len(ws) > 0
    AND (u.s = 0 OR u.s - 48 + 64 < len(ws))
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_token) - 1
            AS BIGINT) AS chunk_idx,
       CAST(start_token AS BIGINT) AS start_token,
       CAST(least(64, len(ws) - start_token) AS BIGINT) AS n_tokens,
       md5(array_to_string(ws[start_token + 1 : start_token + 64], ' ')) AS chunk_hash
FROM starts
"""


def _prefix_scan(
    per_doc: Dataset, budget: int, range_docs: int = 4096, fanout: int = 4096
) -> Dataset:
    """HIERARCHICAL DISTRIBUTED PREFIX SCAN over a (doc_id, n_tokens)
    Dataset — the core shared by ``pack_bins`` and ``curation_pipeline``.
    No level materializes more than n_docs/(range_docs*fanout) rows on the
    driver:

    L1  per-range token sums (groupby) — stays a Dataset;
    L2  per-SUPER-range sums (groupby over L1) — driver prefix-folds these
        (n_docs/(range_docs*fanout) entries; add a level per extra 4096x)
        and broadcasts the super offsets;
    L3  per-range offsets = in-super cumsum of L1 + super offset — emitted
        as a DATASET of (rng, off) rows, never collected;
    L4  offset rows UNION the per-doc rows; one groupby(rng) co-locates a
        range's docs WITH its offset row, and the in-group doc_id-ordered
        cumsum finishes the scan (the same union+co-location trick the
        minhash verify uses instead of a join).

    Output: (doc_id, n_tokens, cum_before, bin_id); invariant across block
    layouts and range sizes (tests/test_functions.py)."""
    import pandas as pd

    import ray as _ray
    from ray.data.aggregate import Sum

    def add_rng(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        ids = _pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "doc_id": ids,
                "rng": _pc.cast(_pc.divide(ids, range_docs), pa.int64()),
                "n_tokens": _pc.cast(t["n_tokens"], pa.int64()),
            }
        )

    per_doc = per_doc.map_batches(add_rng, batch_format="pyarrow")

    # L1: per-range sums (a Dataset — n_ranges rows, distributed)
    l1 = per_doc.groupby("rng").aggregate(Sum("n_tokens", alias_name="s"))

    # L2: super-range sums -> driver prefix fold (the only driver table)
    def to_super(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {
                "sup": _pc.cast(
                    _pc.divide(t["rng"], fanout), pa.int64()
                ),
                "s": t["s"],
            }
        )

    super_sums = (
        l1.map_batches(to_super, batch_format="pyarrow")
        .groupby("sup").aggregate(Sum("s", alias_name="s"))
        .to_pandas()  # n_docs / (range_docs * fanout) rows
        .sort_values("sup")
    )
    super_offsets = dict(
        zip(super_sums["sup"], super_sums["s"].cumsum() - super_sums["s"])
    )
    sref = _ray.put(super_offsets)

    # L3: per-range offsets as a Dataset (in-super cumsum + super offset)
    def range_offsets(g: pd.DataFrame) -> pd.DataFrame:
        off = _ray.get(sref)[int(g["rng"].iloc[0]) // fanout]
        g = g.sort_values("rng")
        return pd.DataFrame(
            {
                "rng": g["rng"].astype("int64"),
                "doc_id": pd.Series([-1] * len(g), dtype="int64").values,
                "n_tokens": pd.Series([0] * len(g), dtype="int64").values,
                "off": (g["s"].cumsum() - g["s"] + off).astype("int64"),
            }
        )

    def add_sup(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["sup"] = (t["rng"] // fanout).astype("int64")
        return t

    offsets_ds = (
        l1.map_batches(add_sup, batch_format="pandas")
        .groupby("sup")
        .map_groups(range_offsets, batch_format="pandas")
    )

    # L4: union offset rows with doc rows; co-locate per range; final cumsum
    def doc_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rng": t["rng"].astype("int64"),
                "doc_id": t["doc_id"].astype("int64"),
                "n_tokens": t["n_tokens"].astype("int64"),
                "off": pd.Series([-1] * len(t), dtype="int64").values,
            }
        )

    unioned = offsets_ds.union(
        per_doc.map_batches(doc_rows, batch_format="pandas")
    )

    def scan_range(g: pd.DataFrame) -> pd.DataFrame:
        off = int(g.loc[g["doc_id"] < 0, "off"].iloc[0])
        g = g[g["doc_id"] >= 0].sort_values("doc_id")
        cum_before = g["n_tokens"].cumsum() - g["n_tokens"] + off
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "n_tokens": g["n_tokens"].astype("int64"),
                "cum_before": cum_before.astype("int64"),
                "bin_id": (cum_before // budget).astype("int64"),
            }
        )

    return unioned.groupby("rng").map_groups(scan_range, batch_format="pandas")


def pack_bins(
    sf_dir: str, budget: int = 512, range_docs: int = 4096, fanout: int = 4096
) -> Dataset:
    """Token-budget sequence packing (the pretraining batch-packing
    primitive): docs in doc_id order fill bins of ``budget`` tokens; a doc's
    bin = floor(tokens-before-it / budget).  Token counting is one
    vectorized pass; the global running total is ``_prefix_scan`` (see its
    docstring for the hierarchical construction)."""

    def counts(batch: pa.Table) -> pa.Table:
        n = [
            len(TOKEN_RE.findall(t.lower()))
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    per_doc = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )
    return _prefix_scan(per_doc, budget, range_docs, fanout)


PACK_BINS_SQL = """
WITH n AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS BIGINT) AS bin_id
FROM n
"""


def dup_chunks(sf_dir: str) -> Dataset:
    """Cross-document duplicate chunks: which fixed-size token windows occur
    in more than one document (the chunk-granular form of exact-substring
    train-data dedup, Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022 — suffix-array full generality traded
    for the shuffle-friendly window hash).  Reuses ``chunk_documents`` and
    co-groups by chunk hash; output (chunk_hash, n_docs, min_doc_id) is the
    removal worklist."""
    from ray.data.aggregate import Count, Min

    chunks = chunk_documents(sf_dir)

    def combine(t: pa.Table) -> pa.Table:
        # in-batch combiner only — exact (doc, hash) dedup happens in the
        # two-level groupby below (a doc's chunks may straddle batches)
        return t.group_by(["doc_id", "chunk_hash"]).aggregate([])

    import zlib

    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * 8)

    def add_bucket(t: pa.Table) -> pa.Table:
        hb = [
            zlib.crc32(h.encode()) % nb
            for h in t.column("chunk_hash").to_pylist()
        ]
        return t.append_column("hb", pa.array(hb, pa.int32()))

    def bucket_fold(g: pd.DataFrame) -> pa.Table:
        # per-hash fold inside a hash bucket: a chunk hash's rows all land
        # here, so in-bucket distinct/count IS global; direct groupbys on
        # chunk_hash are chunk-count-proportional in groups (BASELINE
        # session-5 group-count finding)
        d = g[["chunk_hash", "doc_id"]].drop_duplicates()
        agg = d.groupby("chunk_hash")["doc_id"].agg(["size", "min"])
        agg = agg[agg["size"] > 1].reset_index()
        return pa.table(
            {
                "chunk_hash": pa.array(
                    agg["chunk_hash"].astype(str), pa.string()
                ),
                "n_docs": pa.array(agg["size"].to_numpy("int64")),
                "min_doc_id": pa.array(agg["min"].to_numpy("int64")),
            }
        )

    return (
        chunks.select_columns(["doc_id", "chunk_hash"])
        .map_batches(combine, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(bucket_fold, batch_format="pandas")
    )


DUP_CHUNKS_SQL = f"""
WITH chunks AS ({CHUNK_DOCUMENTS_SQL}),
per_doc AS (SELECT DISTINCT doc_id, chunk_hash FROM chunks)
SELECT chunk_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM per_doc GROUP BY chunk_hash HAVING COUNT(*) > 1
"""


def curation_pipeline(
    sf_dir: str,
    min_tokens: int = 10,
    min_chars: int = 100,
    per_lang_cap: int = 50,
    budget: int = 512,
) -> Dataset:
    """The end-to-end training-data curation flagship, composed from the
    engine's own primitives — quality filter -> exact dedup -> stratified
    per-language cap -> token-budget packing — every stage in its
    scale-safe shape:

    1. ONE vectorized pass derives (n_tokens, n_chars, fingerprint, lang)
       per doc; short/low-token docs drop map-side (`quality_flags` rule).
    2. Exact dedup keeps the LOWEST doc_id per normalized-text fingerprint
       (`dedup_exact` rule) via a coarse fingerprint-bucket co-location —
       one shuffle, vectorized in-group drop_duplicates.
    3. Stratified cap keeps the ``per_lang_cap`` lowest md5(doc_id)-ranked
       docs per language (`stratified_sample` rule) as a bounded-heap
       top-K: each batch prunes locally to K per lang, the final per-lang
       fold sees at most K x n_blocks candidate rows — a hot language
       never co-locates its full stratum.
    4. ``_prefix_scan`` packs survivors into ``budget``-token bins.

    Output: (doc_id, n_tokens, cum_before, bin_id), the packed curated set.
    """
    import pandas as pd

    import pyarrow.parquet as pq

    from ._util import n_buckets

    # fingerprint-dedup co-location buckets derived from the corpus size
    FP_BUCKETS = n_buckets(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )

    def derive(batch: pa.Table) -> pa.Table:
        ids, langs = batch.column("doc_id").to_pylist(), batch.column("lang")
        d_id, d_lang, d_nt, d_fp, d_fb = [], [], [], [], []
        for i, text, lang in zip(ids, batch.column("text").to_pylist(), langs.to_pylist()):
            toks = TOKEN_RE.findall(text.lower())
            if len(toks) < min_tokens or len(text) < min_chars:
                continue
            fp = hashlib.md5(" ".join(toks).encode()).hexdigest()
            d_id.append(int(i))
            d_lang.append(lang)
            d_nt.append(len(toks))
            d_fp.append(fp)
            # 8 hex chars = 32 bits: full-width vs any derived bucket count
            d_fb.append(int(fp[:8], 16) % FP_BUCKETS)
        return pa.table(
            {
                "doc_id": pa.array(d_id, pa.int64()),
                "lang": pa.array(d_lang, pa.string()),
                "n_tokens": pa.array(d_nt, pa.int64()),
                "fp": pa.array(d_fp, pa.string()),
                "fb": pa.array(d_fb, pa.int32()),
            }
        )

    passed = _read_docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        derive, batch_format="pyarrow"
    )

    def dedup_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["fp", "doc_id"]).drop_duplicates("fp", keep="first")
        # arrow out: this is corpus-sized and feeds the lang shuffle
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].astype("int64").values),
                "lang": pa.array(g["lang"].values, pa.string()),
                "n_tokens": pa.array(g["n_tokens"].astype("int64").values),
            }
        )

    deduped = passed.groupby("fb").map_groups(dedup_bucket, batch_format="pandas")

    def local_topk(t: pd.DataFrame) -> pa.Table:
        t = t.copy()
        t["hk"] = [
            hashlib.md5(str(int(i)).encode()).hexdigest() for i in t["doc_id"]
        ]
        t = t.sort_values(["lang", "hk", "doc_id"])
        t = t[t.groupby("lang").cumcount() < per_lang_cap]
        return pa.table(
            {
                "doc_id": pa.array(t["doc_id"].astype("int64").values),
                "lang": pa.array(t["lang"].values, pa.string()),
                "n_tokens": pa.array(t["n_tokens"].astype("int64").values),
                "hk": pa.array(t["hk"].values, pa.string()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "hk", "doc_id"])
        g = g[g.groupby("lang").cumcount() < per_lang_cap]
        return g[["doc_id", "n_tokens"]]

    kept = (
        deduped.map_batches(local_topk, batch_format="pandas")
        .groupby("lang")
        .map_groups(final_topk, batch_format="pandas")
    )

    return _prefix_scan(kept, budget)


CURATION_PIPELINE_SQL = """
WITH derived AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) AS n_tokens,
         md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ')) AS fp
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '[a-z0-9_]+')) >= 10
    AND length(text) >= 100
), deduped AS (
  SELECT doc_id, lang, n_tokens FROM derived
  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
), kept AS (
  SELECT doc_id, n_tokens FROM deduped
  QUALIFY row_number() OVER (
    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  ) <= 50
)
SELECT doc_id, n_tokens,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS BIGINT) AS bin_id
FROM kept
"""


# -- BM25 retrieval -----------------------------------------------------------

#: fixed retrieval query — common corpus words, one rare
BM25_QUERY = ("data", "stream", "vector")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(sf_dir: str, k: int = 10) -> "object":
    """BM25 top-``k`` retrieval for a fixed term query — the classic
    two-pass shape: pass 1 folds tiny per-batch partials (per-term document
    frequency + total token count) on the driver, pass 2 scores every
    document against the |Q|-sized broadcast stats and prunes batch-locally
    to k before a tiny driver fold (no shuffle in either pass).

    Scoring is INTEGER-exact across engines: the per-(doc, term) BM25
    contribution idf * tf_part is a fixed double expression (same libm ln,
    same multiply order) FLOORED to micro-units, and per-doc totals are
    integer sums — order-independent, so the DuckDB oracle hash-matches
    bit-for-bit despite the float core.  Output: (doc_id, score_mu, rk)."""
    import math

    import pandas as pd
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    qset = set(BM25_QUERY)

    def pass1(t: pa.Table) -> pa.Table:
        df = {q: 0 for q in BM25_QUERY}
        dl_sum = 0
        for text in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            dl_sum += len(toks)
            for q in qset.intersection(toks):
                df[q] += 1
        terms = sorted(df) + [""]
        vals = [df[x] for x in sorted(df)] + [dl_sum]
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "v": pa.array(vals, pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(pass1, batch_format="pyarrow")
        .to_pandas()  # <= (|Q|+1) x n_blocks rows
    )
    agg = parts.groupby("term")["v"].sum()
    avgdl = float(agg[""]) / n_docs
    idf = {
        q: math.log((n_docs - int(agg.get(q, 0)) + 0.5) / (int(agg.get(q, 0)) + 0.5) + 1.0)
        for q in BM25_QUERY
    }

    def score(t: pa.Table) -> pa.Table:
        ids, scores = [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            dl = len(toks)
            s = 0
            for q in BM25_QUERY:
                tf = toks.count(q)
                if not tf:
                    continue
                part = (
                    idf[q]
                    * (tf * (BM25_K1 + 1.0))
                    / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
                )
                s += math.floor(part * 1e6)  # micro-units: integer-exact sum
            if s:
                ids.append(doc_id)
                scores.append(s)
        local = (
            pd.DataFrame({"doc_id": ids, "score_mu": scores})
            .sort_values(["score_mu", "doc_id"], ascending=[False, True])
            .head(k)
        )
        return pa.table(
            {
                "doc_id": pa.array(local["doc_id"].astype("int64"), pa.int64()),
                "score_mu": pa.array(
                    local["score_mu"].astype("int64"), pa.int64()
                ),
            }
        )

    cand = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()  # <= k x n_blocks candidate rows
    )
    cand = (
        cand.sort_values(["score_mu", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "doc_id": cand["doc_id"].astype("int64"),
            "score_mu": cand["score_mu"].astype("int64"),
            "rk": pd.array(range(1, len(cand) + 1), dtype="int64"),
        }
    )


#: shared BM25 scored-CTE chain (toks -> dl -> q -> stats -> df -> tf ->
#: scored), reused verbatim by BM25_TOPK_SQL and RRF_FUSION_SQL so the two
#: oracles can never drift.
_BM25_SCORED_CTES = f"""WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), q(term) AS (
  VALUES {", ".join(f"('{t}')" for t in BM25_QUERY)}
), stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         (SELECT SUM(dl) FROM dl) AS total
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df
  FROM toks JOIN q ON tok = term GROUP BY term
), tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM toks JOIN q ON tok = term GROUP BY doc_id, tok
), scored AS (
  SELECT tf.doc_id,
         CAST(SUM(FLOOR(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1!r} + 1.0))
           / (tf.tf + {BM25_K1!r} * (1.0 - {BM25_B!r}
              + {BM25_B!r} * dl.dl / (CAST(stats.total AS DOUBLE) / stats.n)))
           * 1e6)) AS BIGINT) AS score_mu
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)"""

BM25_TOPK_SQL = f"""
{_BM25_SCORED_CTES}
SELECT doc_id, score_mu,
       CAST(row_number() OVER (ORDER BY score_mu DESC, doc_id) AS BIGINT) AS rk
FROM scored
QUALIFY rk <= 10
ORDER BY rk
"""


def lang_top_terms(sf_dir: str, k: int = 5) -> Dataset:
    """Top-k terms PER LANGUAGE — group-wise heavy hitters.  Per-batch
    partial (lang, token) counts combine before the shuffle (the exchange
    carries vocabulary-sized rows, not corpus-sized), then the per-lang
    ranking is ONE vectorized pandas groupby-rank over a lang-bucket
    map_groups (languages are few, so each group is one vocab slice; with
    millions of groups the same kernel runs per hash-bucket of groups,
    exactly like top2_orders_per_customer).  Deterministic tie-break
    (count desc, token asc) mirrored in the oracle."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        langs = t.column("lang").to_pylist()
        for lang, text in zip(langs, t.column("text").to_pylist()):
            for tok in TOKEN_RE.findall(text.lower()):
                counts[(lang, tok)] += 1
        ks = list(counts.keys())
        return pa.table(
            {
                "lang": pa.array([a for a, _ in ks], pa.string()),
                "token": pa.array([b for _, b in ks], pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True])
        g = g.assign(rk=g.groupby("lang").cumcount() + 1)
        g = g[g["rk"] <= k]
        return pd.DataFrame(
            {
                "lang": g["lang"].values,
                "token": g["token"].values,
                "n": g["n"].astype("int64").values,
                "rk": g["rk"].astype("int64").values,
            }
        )

    return (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("partial_n", alias_name="n"))
        .groupby("lang")
        .map_groups(topk, batch_format="pandas")
        .sort(["lang", "rk"])
    )


LANG_TOP_TERMS_SQL = """
SELECT lang, token, n, rk FROM (
  SELECT lang, tok AS token, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(row_number() OVER (
              PARTITION BY lang ORDER BY COUNT(*) DESC, tok
         ) AS BIGINT) AS rk
  FROM (SELECT lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        FROM documents)
  GROUP BY lang, tok
) WHERE rk <= 5 ORDER BY lang, rk
"""


def pmi_bigrams(sf_dir: str, top_by_count: int = 500, k: int = 50) -> "object":
    """Pointwise-mutual-information collocations: PMI over the
    ``top_by_count`` most frequent bigrams — the prune-then-decorate shape
    for association mining at scale.  Pass A is the ``bigram_topk``
    combiner + one vocabulary groupby, pruned to a FIXED-size candidate
    set before anything reaches the driver; pass B streams unigram counts
    for only the candidate tokens (a broadcast ≤2·top set, not the vocab)
    plus the total token count.  PMI = ln((N·c_ab)/(c_a·c_b)) is a fixed
    double expression (int operands < 2^53 stay exact through the
    division, same libm ln) FLOORED to micro-units, so the float core is
    hash-exact vs the oracle — the ``bm25_topk`` technique.
    Output: (bigram, n_ab, pmi_mu, rk)."""
    import math

    from collections import Counter

    import pandas as pd

    from ray.data.aggregate import Sum

    def bigram_partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            counts.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return pa.table(
            {
                "bigram": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    top = (
        _read_docs(sf_dir, ["text"])
        .map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(top_by_count)
        .to_pandas()  # fixed-size candidate set BY CONSTRUCTION
    )
    need = set()
    for bg in top["bigram"]:
        a, b = bg.split(" ")
        need.add(a)
        need.add(b)

    def unigram_partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        total = 0
        for text in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            total += len(toks)
            counts.update(x for x in toks if x in need)
        toks_out = list(counts.keys()) + [""]
        vals = list(counts.values()) + [total]
        return pa.table(
            {
                "tok": pa.array(toks_out, pa.string()),
                "partial_n": pa.array(vals, pa.int64()),
            }
        )

    uni = (
        _read_docs(sf_dir, ["text"])
        .map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("partial_n", alias_name="c"))
        .to_pandas()  # <= 2*top_by_count + 1 rows
    )
    cmap = dict(zip(uni["tok"], uni["c"].astype(int)))
    n_tok = cmap.pop("")
    rows = []
    for bg, c_ab in zip(top["bigram"], top["n"].astype(int)):
        a, b = bg.split(" ")
        pmi_mu = math.floor(
            math.log((n_tok * c_ab) / (cmap[a] * cmap[b])) * 1e6
        )
        rows.append((bg, c_ab, pmi_mu))
    out = pd.DataFrame(rows, columns=["bigram", "n_ab", "pmi_mu"])
    out = out.sort_values(["pmi_mu", "bigram"], ascending=[False, True]).head(k)
    out["rk"] = range(1, len(out) + 1)
    return out.reset_index(drop=True).astype(
        {"n_ab": "int64", "pmi_mu": "int64", "rk": "int64"}
    )


PMI_BIGRAMS_SQL = """
WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws FROM documents
), tok AS (
  SELECT unnest(ws) AS tok FROM t
), n AS (SELECT COUNT(*) AS n_tok FROM tok),
uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
bg AS (
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
  FROM t
), bgc AS (SELECT bigram, COUNT(*) AS c_ab FROM bg GROUP BY bigram),
top AS (SELECT bigram, c_ab FROM bgc ORDER BY c_ab DESC, bigram LIMIT 500),
pmi AS (
  SELECT top.bigram, top.c_ab,
         CAST(FLOOR(ln((n.n_tok * top.c_ab) / (ua.c * ub.c)) * 1e6)
              AS BIGINT) AS pmi_mu
  FROM top
  JOIN uni ua ON ua.tok = split_part(top.bigram, ' ', 1)
  JOIN uni ub ON ub.tok = split_part(top.bigram, ' ', 2)
  CROSS JOIN n
)
SELECT bigram, c_ab AS n_ab, pmi_mu,
       CAST(row_number() OVER (ORDER BY pmi_mu DESC, bigram) AS BIGINT) AS rk
FROM pmi QUALIFY rk <= 50 ORDER BY rk
"""


def char_entropy(sf_dir: str) -> Dataset:
    """Per-document character-distribution Shannon entropy — the classic
    gibberish/low-quality filter signal (C4/Gopher-style pipelines).
    Order-independence trick for the float core: entropy is summed as
    per-(doc, char) INTEGER micro-unit terms floor(-(c/n)·log2(c/n)·1e6)
    — each term a fixed double expression (same libm log2 on both
    engines) — so the sum is exact under any partitioning/visit order and
    hash-matches the oracle.  The kernel is one pass over each batch with
    a per-doc Counter (the established tokenize-kernel shape); no shuffle
    at all — per-doc rows are emitted directly.  Output:
    (doc_id, n_chars, entropy_mu)."""
    import math

    from collections import Counter

    ALPHA = set("abcdefghijklmnopqrstuvwxyz0123456789_")

    def per_doc(t: pa.Table) -> pa.Table:
        ids, ns, ents = [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            counts = Counter(c for c in text.lower() if c in ALPHA)
            n = sum(counts.values())
            mu = 0
            for c in counts.values():
                mu += math.floor(-(c / n) * math.log2(c / n) * 1e6)
            ids.append(doc_id)
            ns.append(n)
            ents.append(mu)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(ns, pa.int64()),
                "entropy_mu": pa.array(ents, pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(per_doc, batch_format="pyarrow")
        .sort("doc_id")
    )


CHAR_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, substr(lower(text), u.i, 1) AS c
  FROM documents, unnest(range(1, len(text) + 1)) AS u(i)
  WHERE substr(lower(text), u.i, 1) SIMILAR TO '[a-z0-9_]'
), cc AS (
  SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY doc_id, c
), n AS (
  SELECT doc_id, SUM(cnt) AS n_chars FROM cc GROUP BY doc_id
)
SELECT cc.doc_id, CAST(n.n_chars AS BIGINT) AS n_chars,
       CAST(SUM(FLOOR(-(cc.cnt / n.n_chars)
                      * log2(cc.cnt / n.n_chars) * 1e6)) AS BIGINT)
         AS entropy_mu
FROM cc JOIN n USING (doc_id)
GROUP BY cc.doc_id, n.n_chars
ORDER BY cc.doc_id
"""


# -- word-bigram surprisal mass (the distributed-count-table LM filter) ------

def bigram_surprisal(sf_dir: str) -> Dataset:
    """Word-bigram surprisal mass per document — the WORD-level sibling of
    ``charlm_quality``'s perplexity filter (CCNet, Wenzek et al., LREC
    2020), integer-exact by scoring each bigram occurrence with the BIT
    LENGTH of its corpus count (floor(log2 c)+1: a doc full of common
    transitions carries high mass, one full of hapax transitions carries
    the minimum 1 per pair plus a hapax count — both strong quality/
    novelty signals).  Unlike the char-bigram table (O(alphabet^2),
    broadcastable), the word-bigram count table is Heaps-bounded but
    corpus-DERIVED — far too large to broadcast — so this op exercises the
    distributed count-table shape: counts and per-doc partials come out of
    ONE bigram-hash-bucketed exchange (all rows of a bigram co-locate, so
    in-bucket sum of per-doc multiplicities IS the global count), then one
    doc-bucket fold assembles per-doc totals.  Rows shipped: one per
    DISTINCT (doc, bigram) — the in-batch Counter is the map-side
    combiner.  Output: (doc_id, n_bigrams, surprisal_mass, n_hapax).
    Bit length is computed exactly via searchsorted against the power-of-
    two table (float log2 rounds up at 2^k-1 for large k)."""
    import zlib

    from collections import Counter

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ._util import n_buckets

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nbh = n_buckets(n_docs * 32)  # ~distinct (doc, bigram) rows per doc
    nbd = n_buckets(n_docs)
    POW2 = 1 << np.arange(63, dtype=np.int64)

    def occ_rows(t: pa.Table) -> pd.DataFrame:
        hbs, hs, ids, mults = [], [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            c = Counter(
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            )
            for b, m in c.items():
                h = hashlib.md5(b.encode()).hexdigest()
                hbs.append(zlib.crc32(h.encode()) % nbh)
                hs.append(h)
                ids.append(doc_id)
                mults.append(m)
        return pd.DataFrame(
            {
                "hb": pd.Series(hbs, dtype="int32"),
                "h": pd.Series(hs, dtype=str),
                "doc_id": pd.Series(ids, dtype="int64"),
                "mult": pd.Series(mults, dtype="int64"),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # every occurrence row of a bigram hash is in this bucket, so the
        # in-bucket multiplicity sum IS the corpus count
        cnt = g.groupby("h")["mult"].transform("sum").to_numpy("int64")
        mult = g["mult"].to_numpy("int64")
        bitlen = np.searchsorted(POW2, cnt, side="right").astype("int64")
        part = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy("int64"),
                "nb": mult,
                "mass": mult * bitlen,
                "hapax": np.where(cnt == 1, mult, 0).astype("int64"),
            }
        )
        out = part.groupby("doc_id", as_index=False).sum()
        out.insert(0, "db", (out["doc_id"] % nbd).astype("int32"))
        return out

    partials = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(occ_rows, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(attach, batch_format="pandas")
        .select_columns(["db", "doc_id", "nb", "mass", "hapax"])
    )

    def zero_rows(t: pd.DataFrame) -> pd.DataFrame:
        k = t["doc_id"].astype("int64")
        z = pd.Series([0] * len(t), dtype="int64").values
        return pd.DataFrame(
            {
                "db": (k % nbd).astype("int32"),
                "doc_id": k,
                "nb": z,
                "mass": z,
                "hapax": z,
            }
        )

    def fold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("doc_id", as_index=False)[["nb", "mass", "hapax"]].sum()
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy("int64")),
                "n_bigrams": pa.array(out["nb"].to_numpy("int64")),
                "surprisal_mass": pa.array(out["mass"].to_numpy("int64")),
                "n_hapax": pa.array(out["hapax"].to_numpy("int64")),
            }
        )

    u = (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(zero_rows, batch_format="pandas")
        .union(partials)
    )
    return u.groupby("db").map_groups(fold, batch_format="pandas")


BIGRAM_SURPRISAL_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id,
         ws[CAST(u.i+1 AS BIGINT)] || ' ' || ws[CAST(u.i+2 AS BIGINT)] AS b
  FROM toks, LATERAL (SELECT unnest(range(len(ws)-1)) AS i) u
),
c AS (SELECT b, COUNT(*) AS cnt FROM bg GROUP BY b),
agg AS (
  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
         SUM(length(printf('%b', cnt))) AS mass,
         SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS hapax
  FROM bg JOIN c USING (b) GROUP BY bg.doc_id
)
SELECT d.doc_id, CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(mass, 0) AS BIGINT) AS surprisal_mass,
       CAST(COALESCE(hapax, 0) AS BIGINT) AS n_hapax
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""


# -- within-doc repetition filter (Gopher repetition signals) -----------------


def _repetition_signals(toks: list) -> tuple:
    """(n_trigrams, dup_tri_occ, dup_tri_chars, top_bigram_mass) for one
    token list — token-id encode once, n-gram keys packed as exact int64
    id tuples (vocab per doc << 2^21), np.unique as the counter.  Shared
    by the operator kernel and the hypothesis property test."""
    import numpy as np

    n = len(toks)
    if n < 2:
        return (max(0, n - 2), 0, 0, 0)
    uniq, ids = np.unique(np.array(toks, dtype=object), return_inverse=True)
    lens = np.array([len(u) for u in uniq], dtype=np.int64)
    ids = ids.astype(np.int64)
    v = np.int64(len(uniq))
    bkey = ids[:-1] * v + ids[1:]
    blen = lens[ids[:-1]] + lens[ids[1:]] + 1
    bu, binv, bcnt = np.unique(bkey, return_inverse=True, return_counts=True)
    blen_u = np.zeros(len(bu), dtype=np.int64)
    blen_u[binv] = blen  # any occurrence's len (all equal per key)
    top_bi = int((bcnt * blen_u).max())
    if n < 3:
        return (0, 0, 0, top_bi)
    tkey = (ids[:-2] * v + ids[1:-1]) * v + ids[2:]
    tlen = lens[ids[:-2]] + lens[ids[1:-1]] + lens[ids[2:]] + 2
    tu, tinv, tcnt = np.unique(tkey, return_inverse=True, return_counts=True)
    tlen_u = np.zeros(len(tu), dtype=np.int64)
    tlen_u[tinv] = tlen
    dup = tcnt > 1
    return (
        int(tcnt.sum()),
        int(tcnt[dup].sum()),
        int((tcnt[dup] * tlen_u[dup]).sum()),
        top_bi,
    )



def repetition_filter(sf_dir: str) -> Dataset:
    """Within-document repetition signals — the Gopher repetition rules
    (Rae et al. 2021 §A1.1: "fraction of characters in duplicate n-grams" /
    "in most common n-gram"), integer-exact.  Per document:

    - ``n_trigrams``      word-trigram occurrences (``max(0, n_words-2)``)
    - ``dup_tri_occ``     occurrences whose trigram appears >=2x in the doc
    - ``dup_tri_chars``   char mass of those occurrences (len of the joined
                          trigram string, spaces included)
    - ``top_bigram_mass`` max over bigrams of ``count * len(bigram)`` — the
                          "most common 2-gram" character-mass numerator

    Entirely doc-local: ONE stateless ``map_batches`` pass, zero shuffle,
    one output row per doc — composes with ``curation_pipeline``'s
    streaming shape at any corpus size (unlike [[line_dedup]] /
    ``substring_dup_coverage``, which measure CROSS-doc duplication).
    Per-doc n-gram counting uses ``np.unique`` over int64 FNV-style rolling
    hashes of token ids, so the per-batch work is numpy, not a Python
    Counter over strings."""
    def signals(batch: pa.Table) -> pa.Table:
        n_tri, dup_occ, dup_chars, top_bi = [], [], [], []
        for text in batch.column("text").to_pylist():
            a, b, c, d = _repetition_signals(TOKEN_RE.findall(text.lower()))
            n_tri.append(a)
            dup_occ.append(b)
            dup_chars.append(c)
            top_bi.append(d)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_trigrams": pa.array(n_tri, pa.int64()),
                "dup_tri_occ": pa.array(dup_occ, pa.int64()),
                "dup_tri_chars": pa.array(dup_chars, pa.int64()),
                "top_bigram_mass": pa.array(top_bi, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        signals, batch_format="pyarrow"
    )


REPETITION_FILTER_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
),
tri AS (
  SELECT doc_id,
         ws[CAST(u.i+1 AS BIGINT)] || ' ' || ws[CAST(u.i+2 AS BIGINT)]
           || ' ' || ws[CAST(u.i+3 AS BIGINT)] AS g
  FROM toks, LATERAL (SELECT unnest(range(greatest(len(ws)-2, 0))) AS i) u
),
tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g),
bi AS (
  SELECT doc_id,
         ws[CAST(u.i+1 AS BIGINT)] || ' ' || ws[CAST(u.i+2 AS BIGINT)] AS g
  FROM toks, LATERAL (SELECT unnest(range(greatest(len(ws)-1, 0))) AS i) u
),
bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g),
ta AS (
  SELECT doc_id, SUM(c) AS n_tri,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ,
         SUM(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup_chars
  FROM tc GROUP BY doc_id
),
ba AS (SELECT doc_id, MAX(c * length(g)) AS top_mass FROM bc GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_trigrams,
       CAST(COALESCE(dup_occ, 0) AS BIGINT) AS dup_tri_occ,
       CAST(COALESCE(dup_chars, 0) AS BIGINT) AS dup_tri_chars,
       CAST(COALESCE(top_mass, 0) AS BIGINT) AS top_bigram_mass
FROM documents d
LEFT JOIN ta ON d.doc_id = ta.doc_id
LEFT JOIN ba ON d.doc_id = ba.doc_id
ORDER BY d.doc_id
"""


# -- char-bigram LM fluency score (the perplexity-filter analog) -------------

def charlm_quality(sf_dir: str) -> "object":
    """Character-bigram language-model fluency score per document — the
    integer-exact analog of the KenLM-perplexity quality filter (CCNet,
    Wenzek et al. 2020): docs whose character transitions are typical of
    the corpus score high, noise/boilerplate scores low.

    Pass A streams corpus-wide char-bigram counts (per-batch numpy
    codepoint kernels, one alphabet-sized groupby fold on the driver —
    the count table is O(|alphabet|^2), NEVER corpus-sized, so the
    broadcast is a few KB at any corpus scale).  Prefix counts derive
    from the bigram table (c_a = sum_b c_ab) — one corpus pass total.
    Pass B broadcasts the quantized transition table floor(1e6*c_ab/c_a)
    (exact: int operands < 2^53 through one double division, PMI/bm25
    technique) and scores each doc as the INTEGER mean of its pair terms:
    sum(int64 terms) // n_pairs.  No float ever crosses a partition
    boundary, so the result is partitioning-invariant and hash-exact vs
    the SQL mirror.  Output: (doc_id, n_pairs, score_mu)."""
    import numpy as np

    import pandas as pd

    def pair_keys(text: str) -> np.ndarray:
        codes = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        return (codes[:-1] << 21) | codes[1:]

    def bigram_partial(t: pa.Table) -> pa.Table:
        chunks = [
            pair_keys(s) for s in t.column("text").to_pylist() if len(s) > 1
        ]
        if not chunks:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        keys, counts = np.unique(np.concatenate(chunks), return_counts=True)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        _read_docs(sf_dir, ["text"])
        .map_batches(bigram_partial, batch_format="pyarrow")
        .to_pandas()  # n_blocks x |alphabet|^2 rows — alphabet-sized
    )
    folded = parts.groupby("key")["n"].sum()
    keys = folded.index.to_numpy(dtype=np.int64)
    c_ab = folded.to_numpy(dtype=np.int64)
    prefix = pd.Series(c_ab).groupby(keys >> 21).sum()
    c_a = prefix.loc[keys >> 21].to_numpy(dtype=np.int64)
    terms = np.floor(1e6 * c_ab / c_a).astype(np.int64)
    ref = ray.put((keys, terms))  # keys are sorted (np.unique/groupby order)

    def score(t: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        out_id, out_n, out_s = [], [], []
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            pk = pair_keys(text) if len(text) > 1 else np.empty(0, np.int64)
            out_id.append(did)
            out_n.append(len(pk))
            out_s.append(
                int(v[np.searchsorted(k, pk)].sum()) // len(pk) if len(pk)
                else 0
            )
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_pairs": pa.array(out_n, pa.int64()),
                "score_mu": pa.array(out_s, pa.int64()),
            }
        )

    out = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


CHARLM_QUALITY_SQL = """
WITH pairs AS (
  SELECT doc_id, substr(text, CAST(u.i AS INTEGER), 2) AS ab,
         substr(text, CAST(u.i AS INTEGER), 1) AS a
  FROM documents, unnest(range(1, length(text))) AS u(i)
), cab AS (
  SELECT ab, COUNT(*) AS n_ab FROM pairs GROUP BY ab
), ca AS (
  SELECT a, COUNT(*) AS n_a FROM pairs GROUP BY a
), term AS (
  SELECT p.doc_id, CAST(FLOOR(1e6 * cab.n_ab / ca.n_a) AS BIGINT) AS t
  FROM pairs p JOIN cab USING (ab) JOIN ca USING (a)
), agg AS (
  SELECT doc_id, COUNT(*) AS n_pairs, SUM(t) AS s
  FROM term GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(agg.s // agg.n_pairs, 0) AS BIGINT) AS score_mu
FROM documents d LEFT JOIN agg USING (doc_id)
ORDER BY d.doc_id
"""


# -- tokenizer training: first BPE merge candidates ---------------------------

def bpe_pair_merges(sf_dir: str, k: int = 20) -> "object":
    """The first step of BPE tokenizer training — rank adjacent CHARACTER
    pairs inside word tokens by corpus frequency (the pair a trainer would
    merge first; contrast ``pmi_bigrams``, which is word-level).  Shape:
    per-batch Counter combiner with a per-unique-token pair cache (the
    alphabet is tiny, so partials are <= ~1.4k rows per batch regardless
    of corpus size), one vocabulary-sized groupby, deterministic top-k
    (count DESC, pair ASC).  Output: (pair, n, rk)."""
    from collections import Counter

    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        tok_pairs: dict[str, list[str]] = {}
        for text in t.column("text").to_pylist():
            for tok in TOKEN_RE.findall(text.lower()):
                ps = tok_pairs.get(tok)
                if ps is None:
                    ps = [tok[j : j + 2] for j in range(len(tok) - 1)]
                    tok_pairs[tok] = ps
                counts.update(ps)
        return pa.table(
            {
                "pair": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    top = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rk"] = pd.RangeIndex(1, len(top) + 1)
    return top.astype({"n": "int64", "rk": "int64"})


BPE_PAIR_MERGES_SQL = """
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), p AS (
  SELECT substr(tok, CAST(u.i AS INT), 2) AS pair
  FROM w, unnest(range(1, len(tok))) AS u(i)
  WHERE len(tok) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(row_number() OVER (ORDER BY COUNT(*) DESC, pair) AS BIGINT) AS rk
FROM p GROUP BY pair ORDER BY rk LIMIT 20
"""


# -- Gopher-rules composite quality filter -----------------------------------

#: The five Gopher-style document rules (Rae et al. 2021, "Scaling Language
#: Models: ... Gopher", §A1.1 quality heuristics), restated as pure-integer
#: inequalities so the oracle hashes exactly (cross-multiplied ratios, no
#: float thresholds).  Word = whitespace token (not TOKEN_RE): the rules
#: score raw layout, not normalized vocabulary.
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000


def gopher_rules(sf_dir: str) -> Dataset:
    """Composite Gopher-style quality filter: per document emit each rule
    flag plus the conjunctive keep decision.  Rules (integer forms):

    - r_wordcount:  GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS
    - r_meanlen:    3 <= mean word length <= 10   (3*n <= total_len <= 10*n)
    - r_symbols:    symbol-to-word ratio <= 0.1   (10*(#'#' + #'...') <= n)
    - r_alpha:      >=80% of words contain a letter (5*n_alpha >= 4*n)
    - r_stopwords:  >=2 distinct common stopwords present

    Shuffle-free: one stateless vectorized pass, one output row per doc —
    the filter composes with ``curation_pipeline``'s streaming shape at any
    corpus size."""
    stop = set(STOPWORDS)

    def flags(batch: pa.Table) -> pa.Table:
        cols: dict[str, list[int]] = {
            "n_words": [], "r_wordcount": [], "r_meanlen": [],
            "r_symbols": [], "r_alpha": [], "r_stopwords": [], "keep": [],
        }
        for text in batch.column("text").to_pylist():
            words = text.split()
            n = len(words)
            total_len = sum(map(len, words))
            n_alpha = sum(1 for w in words if any(c.isalpha() for c in w))
            n_sym = text.count("#") + text.count("...")
            n_stop = len({w.lower() for w in words} & stop)
            r_wc = 1 if GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS else 0
            r_ml = 1 if 3 * n <= total_len <= 10 * n else 0
            r_sy = 1 if 10 * n_sym <= n else 0
            r_al = 1 if 5 * n_alpha >= 4 * n else 0
            r_st = 1 if n_stop >= 2 else 0
            cols["n_words"].append(n)
            cols["r_wordcount"].append(r_wc)
            cols["r_meanlen"].append(r_ml)
            cols["r_symbols"].append(r_sy)
            cols["r_alpha"].append(r_al)
            cols["r_stopwords"].append(r_st)
            cols["keep"].append(r_wc & r_ml & r_sy & r_al & r_st)
        return pa.table(
            {"doc_id": batch.column("doc_id")}
            | {k: pa.array(v, pa.int64()) for k, v in cols.items()}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        flags, batch_format="pyarrow"
    )


GOPHER_RULES_SQL = f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '[^ \t]+') AS ws,
         (length(text) - length(replace(text, '#', '')))
         + (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym
  FROM documents
), m AS (
  SELECT doc_id, len(ws) AS n, n_sym,
         COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS total_len,
         COALESCE(list_sum(list_transform(ws,
             x -> CASE WHEN regexp_matches(x, '[a-zA-Z]') THEN 1 ELSE 0 END)), 0)
           AS n_alpha,
         len(list_intersect(list_transform(ws, x -> lower(x)),
                            ['the','a','of','and','to'])) AS n_stop
  FROM w
)
SELECT doc_id, CAST(n AS BIGINT) AS n_words,
  CAST(CASE WHEN n BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
       THEN 1 ELSE 0 END AS BIGINT) AS r_wordcount,
  CAST(CASE WHEN 3*n <= total_len AND total_len <= 10*n
       THEN 1 ELSE 0 END AS BIGINT) AS r_meanlen,
  CAST(CASE WHEN 10*n_sym <= n THEN 1 ELSE 0 END AS BIGINT) AS r_symbols,
  CAST(CASE WHEN 5*n_alpha >= 4*n THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stopwords,
  CAST(CASE WHEN n BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
             AND 3*n <= total_len AND total_len <= 10*n
             AND 10*n_sym <= n AND 5*n_alpha >= 4*n AND n_stop >= 2
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m
"""


def stopword_scrub(sf_dir: str) -> Dataset:
    """Stopword-removal text transform (the normalization stage a curation
    pipeline runs before n-gram dedup — CCNet/RefinedWeb drop function
    words so boilerplate doesn't dominate shingles).  Per document: strip
    the STOPWORDS set, emit kept/removed counts and the md5 of the
    reconstructed residual text — the hash makes the transform's full
    output comparable without shipping the text to the driver.  Shuffle-
    free one-pass; regex compiled once per process, not per batch."""

    def scrub(batch: pa.Table) -> pa.Table:
        stop = set(STOPWORDS)
        kept_n, removed_n, hashes = [], [], []
        for text in batch.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            kept = [t for t in toks if t not in stop]
            kept_n.append(len(kept))
            removed_n.append(len(toks) - len(kept))
            hashes.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_kept": pa.array(kept_n, pa.int64()),
                "n_removed": pa.array(removed_n, pa.int64()),
                "scrubbed_md5": pa.array(hashes, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow"
    )


STOPWORD_SCRUB_SQL = f"""
SELECT doc_id,
       CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                x -> x NOT IN {STOPWORDS})) AS BIGINT) AS n_kept,
       CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                x -> x IN {STOPWORDS})) AS BIGINT) AS n_removed,
       md5(array_to_string(
           list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                       x -> x NOT IN {STOPWORDS}), ' ')) AS scrubbed_md5
FROM documents
"""


def lang_adaptive_filter(sf_dir: str) -> Dataset:
    """Per-language ADAPTIVE quality cut (the FineWeb2 recalibration insight:
    a global min-length threshold over-prunes terse languages, so each
    language gets its own cutoff).  Pass 1 folds the exact (lang, n_tokens)
    counting histogram — O(strata x length-domain) rows, corpus-size-free —
    and the driver derives each language's lower-discrete P10; pass 2
    streams the corpus once more, keeping docs at or above their own
    language's threshold.  The threshold map is O(|langs|) and rides the
    task closure; no shuffle touches corpus-sized data."""
    from ray.data.aggregate import Count

    def lengths(t: pa.Table) -> pa.Table:
        n = [len(TOKEN_RE.findall(x.lower())) for x in t.column("text").to_pylist()]
        return pa.table(
            {"lang": t.column("lang"), "n_tokens": pa.array(n, pa.int64())}
        )

    hist = (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(lengths, batch_format="pyarrow")
        .groupby(["lang", "n_tokens"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()  # one row per distinct (lang, length)
    )
    thresh: dict[str, int] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_tokens").reset_index(drop=True)
        total = int(g["cnt"].sum())
        k = (total - 1) * 10 // 100
        thresh[str(lang)] = int(g["n_tokens"][g["cnt"].cumsum() > k].iloc[0])

    def keep(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_pylist()
        n = pa.array(
            [len(TOKEN_RE.findall(x.lower())) for x in t.column("text").to_pylist()],
            pa.int64(),
        )
        cuts = pa.array([thresh[l] for l in langs], pa.int64())
        mask = pc.greater_equal(n, cuts)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_tokens": n,
            }
        ).filter(mask)

    return _read_docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        keep, batch_format="pyarrow"
    )


LANG_ADAPTIVE_FILTER_SQL = """
WITH l AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n
  FROM documents
), o AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang ORDER BY n) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS total
  FROM l
), t AS (
  SELECT lang, n AS thresh FROM o WHERE rn = (total - 1) * 10 // 100
)
SELECT l.doc_id, l.lang, CAST(l.n AS BIGINT) AS n_tokens
FROM l JOIN t USING (lang)
WHERE l.n >= t.thresh
"""


def source_drift_ks(sf_dir: str) -> "object":
    """Distribution-drift monitor: exact two-sample Kolmogorov-Smirnov
    distance between every source pair on the token-length distribution
    (the check a crawl pipeline runs when a new snapshot lands — has this
    source's length profile shifted?).  One corpus pass folds the
    (source, n_tokens) counting histogram; the driver fold is
    O(|sources| x length-domain), corpus-size-free.  The statistic is kept
    integer-exact by cross-multiplying the CDFs: ks_cross =
    max_n |cum_a(n) * tot_b - cum_b(n) * tot_a| (divide by tot_a*tot_b for
    the classical D)."""
    import pandas as pd

    from ray.data.aggregate import Count

    def lengths(t: pa.Table) -> pa.Table:
        n = [len(TOKEN_RE.findall(x.lower())) for x in t.column("text").to_pylist()]
        return pa.table(
            {"source": t.column("source"), "n_tokens": pa.array(n, pa.int64())}
        )

    hist = (
        _read_docs(sf_dir, ["text", "source"])
        .map_batches(lengths, batch_format="pyarrow")
        .groupby(["source", "n_tokens"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    # cumulative counts on the shared length grid (missing cells = 0)
    cdf = (
        hist.pivot_table(index="n_tokens", columns="source", values="cnt",
                         aggfunc="sum", fill_value=0)
        .sort_index()
        .cumsum()
        .astype("int64")
    )
    tot = cdf.iloc[-1]
    sources = sorted(cdf.columns)
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            ks = int(
                (cdf[a].to_numpy() * int(tot[b])
                 - cdf[b].to_numpy() * int(tot[a])).__abs__().max()
            )
            rows.append((a, b, ks, int(tot[a]), int(tot[b])))
    return pd.DataFrame(
        rows, columns=["source_a", "source_b", "ks_cross", "n_a", "n_b"]
    ).sort_values(["source_a", "source_b"]).reset_index(drop=True)


SOURCE_DRIFT_KS_SQL = """
WITH l AS (
  SELECT source, len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n
  FROM documents
), h AS (
  SELECT source, n, COUNT(*) AS c FROM l GROUP BY 1, 2
), tot AS (
  SELECT source, COUNT(*) AS tot FROM l GROUP BY 1
), grid AS (
  SELECT DISTINCT n FROM l
), cum AS (
  SELECT s.source, g.n, s.tot,
         SUM(COALESCE(h.c, 0)) OVER (PARTITION BY s.source ORDER BY g.n) AS cum
  FROM tot s CROSS JOIN grid g
  LEFT JOIN h ON h.source = s.source AND h.n = g.n
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(MAX(ABS(a.cum * b.tot - b.cum * a.tot)) AS BIGINT) AS ks_cross,
       CAST(MAX(a.tot) AS BIGINT) AS n_a,
       CAST(MAX(b.tot) AS BIGINT) AS n_b
FROM cum a
JOIN cum b ON a.n = b.n AND a.source < b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


def langid_confusion(sf_dir: str) -> Dataset:
    """Classifier-evaluation confusion matrix: corpus counts per (true
    ``lang``, predicted ``pred_lang``) for the LangId actor — the quality
    check a curation pipeline runs on its language router before trusting
    per-language branches.  The actor pool predicts per batch (model state
    built once per actor), the batch combiner collapses to <=|langs|^2
    partial rows, one tiny groupby folds them.  Output: (lang, pred_lang,
    n)."""
    from ray.data.aggregate import Sum

    class ConfusionPartials(LangId):
        def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
            from collections import Counter

            c: Counter = Counter()
            for text, lang in zip(
                batch.column("text").to_pylist(),
                batch.column("lang").to_pylist(),
            ):
                toks = set(self.token_re.findall(text.lower()))
                best_lang, best = "und", -1
                for pl in sorted(self.profiles):
                    s = len(toks & self.profiles[pl])
                    if s > best:
                        best_lang, best = pl, s
                c[(lang, best_lang)] += 1
            ks = sorted(c)
            return pa.table(
                {
                    "lang": pa.array([k[0] for k in ks], pa.string()),
                    "pred_lang": pa.array([k[1] for k in ks], pa.string()),
                    "n": pa.array([c[k] for k in ks], pa.int64()),
                }
            )

    return (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(ConfusionPartials, batch_format="pyarrow",
                     concurrency=(1, 4))
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["lang", "pred_lang"])
    )


LANGID_CONFUSION_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
  FROM documents
), profiles(pl, words) AS (VALUES {_lang_profile_values()}),
scores AS (
  SELECT doc_id, lang, pl, len(list_intersect(w, words)) AS s
  FROM toks CROSS JOIN profiles
), pred AS (
  SELECT doc_id, lang, pl AS pred_lang
  FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY s DESC, pl) AS rn
        FROM scores)
  WHERE rn = 1
)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- compression-ratio quality signal (rows-only: no zlib in SQL) -------------

def compression_ratio(sf_dir: str) -> Dataset:
    """Per-document zlib compression ratio — the redundancy signal
    RefinedWeb-style curation uses alongside the repetition heuristics
    (``repetition_stats``): highly compressible text is boilerplate/spam,
    incompressible text is noise; both tails get reviewed.  Pure streaming
    map (no exchange); zlib level pinned so the output is bit-deterministic
    across machines.  No SQL oracle exists (DuckDB has no zlib), so the
    correctness gate is the pytest equality vs a single-process pass plus
    partitioning invariance.  Output: (doc_id, raw_len, comp_len,
    ratio_bp) with ratio_bp = comp_len * 10000 // raw_len."""
    import zlib

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def ratios(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        raw_l, comp_l, bp = [], [], []
        for txt in t.column("text").to_pylist():
            b = txt.encode()
            c = zlib.compress(b, 6)
            raw_l.append(len(b))
            comp_l.append(len(c))
            bp.append(len(c) * 10000 // max(len(b), 1))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "raw_len": pa.array(raw_l, pa.int64()),
                "comp_len": pa.array(comp_l, pa.int64()),
                "ratio_bp": pa.array(bp, pa.int64()),
            }
        )

    return docs.map_batches(ratios, batch_format="pyarrow")


# -- BPE training (iterative) + tokenizer fertility ---------------------------

_BPE_MEMO: dict[tuple, list] = {}


def _bpe_apply(word: str, merges: list, ranks: dict) -> list:
    """Greedy BPE segmentation (Sennrich et al., ACL 2016): repeatedly merge
    the adjacent symbol pair with the LOWEST merge rank, all occurrences
    left-to-right, until no learned pair remains."""
    syms = list(word)
    big = 1 << 30
    while len(syms) > 1:
        best = big
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]), big)
            if r < best:
                best = r
        if best == big:
            break
        a, b = merges[best]
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_train(sf_dir: str, n_merges: int = 12) -> list:
    """Full iterative BPE training as a Ray Data pipeline, the way real
    trainers scale it: train over the WORD-FREQUENCY table, not the corpus
    (one corpus pass builds (word, n); every merge iteration is then a pass
    over the vocabulary — Heaps-bounded — with the current merge list
    broadcast, emitting per-batch weighted pair partials into a tiny
    (pairs-in-segmentation)-sized groupby; the driver picks the argmax
    (count DESC, pair ASC) and appends one merge).  The vocab table is
    materialized ONCE (it is sketch-sized relative to the corpus), so T
    iterations never rescan the corpus.  Memoized per (sf_dir, n_merges).
    Contrast ``bpe_pair_merges``, which ranks only the FIRST merge."""
    from collections import Counter

    from ray.data.aggregate import Sum

    memo_key = (sf_dir, n_merges)
    if memo_key in _BPE_MEMO:
        return _BPE_MEMO[memo_key]

    def wf_partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in t.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(text.lower()))
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    wf = (
        _read_docs(sf_dir, ["text"])
        .map_batches(wf_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
        .materialize()  # vocabulary-sized, reused by every iteration
    )

    merges: list = []
    for _ in range(n_merges):
        ref = ray.put(list(merges))

        def pair_partial(t: pa.Table) -> pa.Table:
            ms = ray.get(ref)
            ranks = {p: i for i, p in enumerate(ms)}
            c: Counter = Counter()
            for w, n in zip(
                t.column("token").to_pylist(), t.column("n").to_pylist()
            ):
                syms = _bpe_apply(w, ms, ranks)
                for a, b in zip(syms, syms[1:]):
                    c[(a, b)] += n
            return pa.table(
                {
                    "a": pa.array([k[0] for k in c], pa.string()),
                    "b": pa.array([k[1] for k in c], pa.string()),
                    "pn": pa.array(list(c.values()), pa.int64()),
                }
            )

        agg = (
            wf.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(Sum("pn", alias_name="n"))
            .to_pandas()  # pairs present in the current segmentation
        )
        if agg.empty:
            break
        agg = agg.sort_values(
            ["n", "a", "b"], ascending=[False, True, True]
        )
        merges.append((agg.iloc[0]["a"], agg.iloc[0]["b"]))
    _BPE_MEMO[memo_key] = merges
    return merges


def bpe_fertility(sf_dir: str, n_merges: int = 12) -> Dataset:
    """Tokenizer-fertility audit: apply the learned BPE merge table
    (broadcast once) to every document and report
    (doc_id, n_words, n_subtokens, fertility_bp = 10000*subtokens//words)
    — the tokens-per-word statistic that decides whether a tokenizer suits
    a corpus.  One streaming pass; segmentation per UNIQUE word is cached
    per batch.  Rows-only for the driver (iterative BPE has no SQL form);
    equality vs an independent single-process BPE is the pytest gate."""
    merges = bpe_train(sf_dir, n_merges)
    ref = ray.put(merges)

    def stats(t: pa.Table) -> pa.Table:
        ms = ray.get(ref)
        ranks = {p: i for i, p in enumerate(ms)}
        cache: dict = {}
        ids, nw, ns, fb = [], [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            total = 0
            for w in toks:
                n = cache.get(w)
                if n is None:
                    n = len(_bpe_apply(w, ms, ranks))
                    cache[w] = n
                total += n
            ids.append(doc_id)
            nw.append(len(toks))
            ns.append(total)
            fb.append(10000 * total // len(toks) if toks else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_subtokens": pa.array(ns, pa.int64()),
                "fertility_bp": pa.array(fb, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


# -- PII scrubbing with rewrite (the C4-style masking pass) -------------------

#: RE2-compatible (no \b, no lookaround) so the DuckDB oracle runs the SAME
#: patterns; applied in this order, counting before each replacement.
PII_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
    ("ip", r"(\d{1,3}\.){3}\d{1,3}", "<IP>"),
)


class PiiScrubber:
    """Actor-pool stage: the three compiled patterns live in actor state;
    per batch, each doc is scrubbed in PATTERN ORDER (emails first, so a
    phone-looking fragment inside an address never double-masks), counting
    matches before each replacement."""

    def __init__(self):
        self.pats = [
            (name, re.compile(pat), sub) for name, pat, sub in PII_PATTERNS
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, counts, md = [], {n: [] for n, _, _ in PII_PATTERNS}, []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            cur = text
            for name, cre, sub in self.pats:
                cur, n = cre.subn(sub, cur)
                counts[name].append(n)
            ids.append(doc_id)
            md.append(hashlib.md5(cur.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_emails": pa.array(counts["email"], pa.int64()),
                "n_phones": pa.array(counts["phone"], pa.int64()),
                "n_ips": pa.array(counts["ip"], pa.int64()),
                "scrubbed_md5": pa.array(md, pa.string()),
            }
        )


def pii_scrub(sf_dir: str) -> Dataset:
    """PII masking pass (the C4/Dolma-style scrub): emails, phones and
    IPv4s replaced by typed tokens, per-doc match counts + an md5 of the
    scrubbed text (rewrite jobs would write the scrubbed column itself).
    Zero shuffle — one actor-pool streaming pass; patterns are
    RE2-compatible so the DuckDB oracle applies the IDENTICAL regexes in
    the IDENTICAL order.  The synthetic corpus contains no PII (all-zero
    counts, md5 == original md5) — the planted-PII gate is
    tests/test_functions.py::test_pii_scrub_planted."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        PiiScrubber, batch_format="pyarrow", concurrency=(1, 8)
    )


def _pii_sql() -> str:
    cur = "text"
    count_cols = []
    for name, pat, sub in PII_PATTERNS:
        count_cols.append(
            f"CAST(length(regexp_extract_all({cur}, '{pat}')) AS BIGINT)"
            f" AS n_{name}s"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{sub}', 'g')"
    return f"""
SELECT doc_id,
       {', '.join(count_cols)},
       md5({cur}) AS scrubbed_md5
FROM documents
ORDER BY doc_id
"""


PII_SCRUB_SQL = _pii_sql()


# -- Heaps'-law vocabulary growth curve ----------------------------------------

HEAPS_CHECKPOINTS = 8


def heaps_vocab_growth(sf_dir: str) -> "object":
    """Heaps'-law vocabulary-growth curve: distinct-vocabulary size and
    total token count after each eighth of the corpus in doc_id order —
    the sub-linearity audit (V ≈ K·nᵝ, β<1) that tells a tokenizer-training
    run how much NEW vocabulary additional data still buys.

    A token first contributes to the curve at its MINIMUM doc_id, so the
    distributed shape is: per-batch fold to (token, min doc_id) partials
    (the vocab_topk combiner, min instead of count), one groupby over the
    VOCABULARY (never corpus rows) taking the global min, then a fold of
    first-occurrence doc ids into the K-checkpoint histogram — the driver
    sees K rows.  Token totals per checkpoint ride the same batch pass as
    a K-vector of partial sums.  Checkpoints are ⌈j·n_docs/8⌉ with n_docs
    from parquet METADATA (no scan).  Output: (checkpoint, docs_le,
    vocab_size, tokens_total).  Beyond-reference engine addition
    (SURVEY.md §2.8)."""
    import bisect

    import pandas as pd

    import pyarrow.parquet as pq

    from ray.data.aggregate import Min, Sum

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cps = sorted({(j * n_docs) // HEAPS_CHECKPOINTS
                  for j in range(1, HEAPS_CHECKPOINTS + 1)})

    def partial(t: pa.Table) -> pa.Table:
        toks: dict[str, int] = {}
        tok_cp = [0] * len(cps)
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            words = TOKEN_RE.findall(text.lower())
            i = bisect.bisect_left(cps, doc_id)
            for j in range(i, len(cps)):
                tok_cp[j] += len(words)
            for w in words:
                prev = toks.get(w)
                if prev is None or doc_id < prev:
                    toks[w] = doc_id
        out = pa.table(
            {
                "token": pa.array(list(toks.keys()), pa.string()),
                "min_doc": pa.array(list(toks.values()), pa.int64()),
                "kind": pa.array([0] * len(toks), pa.int8()),
                "cp_idx": pa.array([-1] * len(toks), pa.int64()),
                "tok_n": pa.array([0] * len(toks), pa.int64()),
            }
        )
        tot = pa.table(
            {
                "token": pa.array([f"\x00cp{i}" for i in range(len(cps))],
                                  pa.string()),
                "min_doc": pa.array([0] * len(cps), pa.int64()),
                "kind": pa.array([1] * len(cps), pa.int8()),
                "cp_idx": pa.array(list(range(len(cps))), pa.int64()),
                "tok_n": pa.array(tok_cp, pa.int64()),
            }
        )
        return pa.concat_tables([out, tot])

    folded = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["token", "kind", "cp_idx"])
        .aggregate(Min("min_doc", alias_name="md"),
                   Sum("tok_n", alias_name="tn"))
        .to_pandas()  # O(vocab + K) rows
    )
    vocab = folded[folded["kind"] == 0]
    firsts = sorted(int(x) for x in vocab["md"])
    tots = {int(i): int(n) for i, n in zip(
        folded[folded["kind"] == 1]["cp_idx"],
        folded[folded["kind"] == 1]["tn"])}
    rows = []
    for i, cp in enumerate(cps):
        rows.append(
            {
                "checkpoint": i + 1,
                "docs_le": cp,
                "vocab_size": bisect.bisect_right(firsts, cp),
                "tokens_total": tots.get(i, 0),
            }
        )
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in
         ("checkpoint", "docs_le", "vocab_size", "tokens_total")}
    )


def _heaps_sql() -> str:
    # both sides cut on the RAW doc_id value against j*n_docs//8 (no
    # density assumption); DuckDB derives n_docs from COUNT(*), the Ray
    # side from parquet metadata.
    return f"""
WITH n AS (SELECT COUNT(*) AS nd FROM documents),
cps AS (
  SELECT j AS checkpoint, (j * n.nd) // {HEAPS_CHECKPOINTS} AS docs_le
  FROM generate_series(1, {HEAPS_CHECKPOINTS}) AS t(j), n
),
tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
  FROM documents
),
firsts AS (SELECT w, MIN(doc_id) AS md FROM tok GROUP BY w)
SELECT c.checkpoint, CAST(c.docs_le AS BIGINT) AS docs_le,
       CAST((SELECT COUNT(*) FROM firsts f WHERE f.md <= c.docs_le)
            AS BIGINT) AS vocab_size,
       CAST((SELECT COUNT(*) FROM tok t WHERE t.doc_id <= c.docs_le)
            AS BIGINT) AS tokens_total
FROM cps c ORDER BY c.checkpoint
"""


HEAPS_VOCAB_GROWTH_SQL = _heaps_sql()


# -- Yule's K lexical-richness audit -------------------------------------------

def yule_k_by_lang(sf_dir: str) -> "object":
    """Yule's characteristic constant K per language — the classic
    repeat-rate measure of lexical richness (Yule 1944; low K = rich
    vocabulary, high K = repetitive), the corpus-quality audit companion
    to ``char_entropy``/``compression_ratio``.  K = 10⁴·(Σc² − n)/n² over
    the per-(lang, token) frequency table.

    Scale shape: per-batch combiner token counts feed ONE (lang, token)
    groupby bounded by the VOCABULARY (Heaps' law), never the corpus; the
    per-lang moments (Σc², Σc, V) then fold through a second combiner
    map_batches over the vocabulary rows into a |langs|-row aggregate —
    nothing vocabulary-sized reaches the driver.  Output keeps the
    statistic exact as a 1e10-scaled floor:
    ``yule_e10 = 10¹⁰·(Σc² − n) // n²``.  Output: (lang, n_tokens, vocab,
    yule_e10).  Beyond-reference engine addition (SURVEY.md §2.8)."""
    import pandas as pd

    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        langs, toks, ns = [], [], []
        lc = t.column("lang").to_pylist()
        for lang, text in zip(lc, t.column("text").to_pylist()):
            c = Counter(TOKEN_RE.findall(text.lower()))
            langs.extend([lang] * len(c))
            toks.extend(c.keys())
            ns.extend(c.values())
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "token": pa.array(toks, pa.string()),
                "pn": pa.array(ns, pa.int64()),
            }
        )

    vocab = (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("pn", alias_name="c"))
    )

    def moments(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.cast(t["c"], pa.int64())
        g = pa.table(
            {
                "lang": t["lang"],
                "s1": c,
                "s2": pc.multiply(c, c),
                "v": pa.array([1] * len(c), pa.int64()),
            }
        )
        return pa.TableGroupBy(g, ["lang"]).aggregate(
            [("s1", "sum"), ("s2", "sum"), ("v", "sum")]
        )

    m = (
        vocab.map_batches(moments, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("s1_sum", alias_name="s1"),
            Sum("s2_sum", alias_name="s2"),
            Sum("v_sum", alias_name="v"),
        )
        .to_pandas()  # |langs| rows
    )
    rows = []
    for r in m.itertuples():
        n, s2 = int(r.s1), int(r.s2)
        rows.append(
            {"lang": r.lang, "n_tokens": n, "vocab": int(r.v),
             "yule_e10": 10**10 * (s2 - n) // (n * n)}
        )
    return (
        pd.DataFrame(sorted(rows, key=lambda x: x["lang"]))
        .astype({c: "int64" for c in ("n_tokens", "vocab", "yule_e10")})
        .reset_index(drop=True)
    )


YULE_K_BY_LANG_SQL = """
WITH tf AS (
  SELECT lang, tok, COUNT(*) AS c
  FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+'))
          AS tok FROM documents)
  GROUP BY 1, 2
),
m AS (
  SELECT lang, CAST(SUM(c) AS HUGEINT) AS n,
         SUM(CAST(c AS HUGEINT) * c) AS s2,
         COUNT(*) AS v
  FROM tf GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS vocab,
       CAST(CAST(10000000000 AS HUGEINT) * (s2 - n) // (n * n) AS BIGINT)
         AS yule_e10
FROM m ORDER BY lang
"""

# -- TextRank keyword extraction ----------------------------------------------

TEXTRANK_MASS = 10 ** 9
TEXTRANK_ITERS = 5
TEXTRANK_MIN_LEN = 3   # tokens shorter than this never enter the graph
TEXTRANK_TOP = 30


def textrank_keywords(sf_dir: str) -> "object":
    """TextRank (Mihalcea & Tarau, EMNLP 2004): PageRank over the corpus
    word co-occurrence graph — adjacency window 2 on the raw token stream,
    undirected distinct edges, both endpoints >= 3 chars — the classic
    unsupervised keyword extractor.  The rank iteration reuses the
    pagerank_knn integer fixed point (mass // V seed, 85/15 floor
    divisions), so the APPROXIMATE algorithm replays bit-for-bit in SQL.

    Scale shape: per-batch distinct-pair combiners feed one vocabulary-
    bounded groupby (Heaps' law keeps the edge set sublinear in the
    corpus); the rank loop runs on the driver over that vocabulary-sized
    edge list — graph size is a property of the LANGUAGE, not the corpus,
    so this driver fold is bounded at any data volume.  Output: top-30
    (word, rank_mu)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count

    min_len = TEXTRANK_MIN_LEN

    def pair_partial(t: pa.Table) -> pa.Table:
        pairs: set[tuple[str, str]] = set()
        for text_ in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text_.lower())
            for i in range(len(toks) - 1):
                a, b = toks[i], toks[i + 1]
                if len(a) >= min_len and len(b) >= min_len and a != b:
                    pairs.add((a, b) if a < b else (b, a))
        lo, hi = (
            zip(*sorted(pairs)) if pairs else ((), ())
        )
        return pa.table(
            {
                "lo": pa.array(list(lo), pa.string()),
                "hi": pa.array(list(hi), pa.string()),
            }
        )

    edges = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # vocabulary-bounded distinct edge set
    )

    S = TEXTRANK_MASS
    words = np.unique(
        np.concatenate([edges["lo"].to_numpy(), edges["hi"].to_numpy()])
    )
    V = len(words)
    li = np.searchsorted(words, edges["lo"].to_numpy())
    hi_i = np.searchsorted(words, edges["hi"].to_numpy())
    src = np.concatenate([li, hi_i])   # undirected: both directions
    dst = np.concatenate([hi_i, li])
    deg = np.bincount(src, minlength=V).astype(np.int64)
    tp = (15 * (S // V)) // 100
    rank = np.full(V, S // V, dtype=np.int64)
    for _ in range(TEXTRANK_ITERS):
        in_sum = np.zeros(V, dtype=np.int64)
        np.add.at(in_sum, dst, rank[src] // deg[src])
        rank = tp + (85 * in_sum) // 100
    out = (
        pd.DataFrame({"word": words, "rank_mu": rank})
        .sort_values(["rank_mu", "word"], ascending=[False, True])
        .head(TEXTRANK_TOP)
        .reset_index(drop=True)
    )
    out["rank_mu"] = out["rank_mu"].astype("int64")
    return out


def _textrank_sql(iters: int = TEXTRANK_ITERS) -> str:
    S = TEXTRANK_MASS
    prev = "r0"
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""r{i} AS (
  SELECT w.w,
         CAST((15 * ({S} // s.v)) // 100
              + (85 * COALESCE(i{i}.in_sum, 0)) // 100 AS BIGINT) AS r
  FROM words w CROSS JOIN stats s LEFT JOIN (
    SELECT e.dst AS w, SUM({prev}.r // e.k_out) AS in_sum
    FROM e JOIN {prev} ON e.src = {prev}.w GROUP BY e.dst
  ) i{i} USING (w)
)""")
        prev = f"r{i}"
    joined = ",\n".join(steps)
    return f"""
WITH arrs AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr FROM documents
),
adj AS (
  SELECT arr[i] AS w1, arr[i + 1] AS w2
  FROM arrs, UNNEST(range(1, len(arr))) AS t(i)
),
pairs AS (
  SELECT DISTINCT LEAST(w1, w2) AS lo, GREATEST(w1, w2) AS hi
  FROM adj
  WHERE length(w1) >= {TEXTRANK_MIN_LEN} AND length(w2) >= {TEXTRANK_MIN_LEN}
        AND w1 != w2
),
words AS (SELECT lo AS w FROM pairs UNION SELECT hi FROM pairs),
stats AS (SELECT COUNT(*) AS v FROM words),
e0 AS (
  SELECT lo AS src, hi AS dst FROM pairs
  UNION ALL SELECT hi, lo FROM pairs
),
deg AS (SELECT src, COUNT(*) AS k_out FROM e0 GROUP BY src),
e AS MATERIALIZED (
  SELECT e0.src, e0.dst, d.k_out FROM e0 JOIN deg d USING (src)
),
r0 AS (SELECT w.w, CAST({S} // s.v AS BIGINT) AS r FROM words w CROSS JOIN stats s),
{joined}
SELECT w AS word, r AS rank_mu FROM {prev}
ORDER BY rank_mu DESC, word LIMIT {TEXTRANK_TOP}"""


TEXTRANK_KEYWORDS_SQL = _textrank_sql()


# -- out-of-vocabulary rate sweep -----------------------------------------------

OOV_VOCAB_SIZES = (1_000, 5_000, 10_000)


def oov_rate(sf_dir: str) -> "object":
    """Out-of-vocabulary rate for candidate vocabulary sizes — the
    tokenizer-budget question ("how much of the corpus does a V-entry
    vocab cover?").  One vocabulary-bounded token-count fold (the
    vocab_topk combiner shape); the sweep is a driver sort of the
    VOCABULARY (never the corpus) with the deterministic (count desc,
    token asc) tie-break mirrored in the oracle's ROW_NUMBER.  oov_ppm is
    floored integer parts-per-million.  Output: (v_size, oov_tokens,
    total_tokens, oov_ppm)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for text_ in t.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(text_.lower()))
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    vocab = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()  # vocabulary-bounded (Heaps), never corpus-sized
        .sort_values(["n", "token"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = int(vocab["n"].sum())
    cum = vocab["n"].cumsum()
    rows = []
    for v in OOV_VOCAB_SIZES:
        kept = int(cum.iloc[min(v, len(vocab)) - 1]) if len(vocab) else 0
        oov = total - kept
        rows.append(
            {
                "v_size": v,
                "oov_tokens": oov,
                "total_tokens": total,
                "oov_ppm": (oov * 10 ** 6) // total if total else 0,
            }
        )
    return pd.DataFrame(rows).astype("int64")


OOV_RATE_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS n,
         row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
  FROM toks GROUP BY tok
), tot AS (SELECT SUM(n) AS total FROM vocab),
vs AS (SELECT UNNEST(ARRAY{list(OOV_VOCAB_SIZES)}) AS v_size)
SELECT CAST(v.v_size AS BIGINT) AS v_size,
       CAST(t.total - COALESCE(SUM(vc.n) FILTER (WHERE vc.rk <= v.v_size), 0)
            AS BIGINT) AS oov_tokens,
       CAST(t.total AS BIGINT) AS total_tokens,
       CAST(((t.total - COALESCE(SUM(vc.n) FILTER (WHERE vc.rk <= v.v_size), 0))
             * 1000000) // t.total AS BIGINT) AS oov_ppm
FROM vs v CROSS JOIN tot t LEFT JOIN vocab vc ON TRUE
GROUP BY v.v_size, t.total ORDER BY v.v_size
"""


# -- within-document self-repetition histogram ----------------------------------

SELFREP_BAND_W = 100_000  # ppm band width -> 10 bands + the all-unique band


def selfrep_hist(sf_dir: str) -> "object":
    """Within-document self-repetition audit — the Gopher/RefinedWeb-style
    quality signal "how much of this doc is the same trigram over and
    over": rep_ppm = (total_trigrams - distinct_trigrams) * 1e6 //
    total_trigrams per doc, histogrammed into 100k-ppm bands.  Purely
    per-doc (zero shuffle on the doc axis) with a <=11-row band fold;
    docs with fewer than 3 tokens land in band -1 so the rows always sum
    to the corpus.  Output: (band, n_docs)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        bands: dict[int, int] = {}
        for text_ in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text_.lower())
            n = len(toks) - 2
            if n <= 0:
                band = -1
            else:
                tris = list(zip(toks, toks[1:], toks[2:]))
                rep = n - len(set(tris))
                band = (rep * 10 ** 6 // n) // SELFREP_BAND_W
            bands[band] = bands.get(band, 0) + 1
        return pa.table(
            {
                "band": pa.array(list(bands.keys()), pa.int64()),
                "n_docs": pa.array(list(bands.values()), pa.int64()),
            }
        )

    out = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()  # <= 11 rows
    )
    return out.sort_values("band").reset_index(drop=True).astype("int64")


SELFREP_HIST_SQL = f"""
WITH arrs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr
  FROM documents
),
tris AS (
  SELECT doc_id, arr[i] || '\x01' || arr[i + 1] || '\x01' || arr[i + 2] AS tri
  FROM arrs, UNNEST(range(1, len(arr) - 1)) AS t(i)
),
per_doc AS (
  SELECT a.doc_id,
         CASE WHEN len(a.arr) < 3 THEN -1
              ELSE ((COUNT(s.tri) - COUNT(DISTINCT s.tri)) * 1000000
                    // COUNT(s.tri)) // {SELFREP_BAND_W} END AS band
  FROM arrs a LEFT JOIN tris s USING (doc_id)
  GROUP BY a.doc_id, len(a.arr)
)
SELECT CAST(band AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY band ORDER BY band
"""


# -- Zipf's-law rank-frequency audit ----------------------------------------------

ZIPF_TOP = 20


def zipf_check(sf_dir: str) -> "object":
    """Zipf's-law audit of the corpus token distribution: for the top-20
    ranks, the invariant product rank * freq (constant under an ideal
    zipfian s=1) and its ppm ratio to the rank-1 mass — float-free, so
    the slope-fit's log-log regression is replaced by the exact integer
    diagnostic a corpus reviewer actually eyeballs.  One Heaps-bounded
    vocab fold; ranks use the deterministic (count desc, token asc)
    order.  Output: (rank, token, freq, rank_x_freq, ratio_ppm)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for text_ in t.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(text_.lower()))
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    vocab = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()  # vocabulary-bounded (Heaps)
        .sort_values(["n", "token"], ascending=[False, True])
        .head(ZIPF_TOP)
        .reset_index(drop=True)
    )
    f1 = int(vocab["n"].iloc[0])
    rows = []
    for r, (tok, n) in enumerate(
        zip(vocab["token"], vocab["n"].astype(int)), start=1
    ):
        rows.append(
            {
                "rank": r,
                "token": tok,
                "freq": n,
                "rank_x_freq": r * n,
                "ratio_ppm": (r * n * 10 ** 6) // f1,
            }
        )
    return pd.DataFrame(rows).astype(
        {"rank": "int64", "freq": "int64",
         "rank_x_freq": "int64", "ratio_ppm": "int64"}
    )


ZIPF_CHECK_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, COUNT(*) AS n,
         row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
  FROM toks GROUP BY tok
),
f1 AS (SELECT n AS f FROM vocab WHERE rank = 1)
SELECT CAST(rank AS BIGINT) AS rank, tok AS token,
       CAST(n AS BIGINT) AS freq,
       CAST(rank * n AS BIGINT) AS rank_x_freq,
       CAST((rank * n * 1000000) // f1.f AS BIGINT) AS ratio_ppm
FROM vocab CROSS JOIN f1
WHERE rank <= {ZIPF_TOP}
ORDER BY rank
"""


# -- Chao1 unseen-vocabulary estimate --------------------------------------------------

def chao1_vocab(sf_dir: str) -> "object":
    """Chao1 species-richness estimate of the UNSEEN vocabulary (Chao
    1984, the ecology estimator linguists use for "how many words exist
    that this corpus never sampled"): chao1 = V_obs + f1^2 / (2*f2),
    with f1/f2 the singleton/doubleton counts from the frequency-of-
    frequencies.  Everything is exact integers — the estimate ships as
    V_obs plus the floored correction — and the bias-corrected variant's
    ingredients (f1, f2) are in the row for reviewers who prefer it.
    One Heaps-bounded vocab fold; the frequency-of-frequencies is a
    driver fold over the vocabulary.  Output: one row (v_obs, f1, f2,
    total_tokens, chao1)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for text_ in t.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(text_.lower()))
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "partial_n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    vocab = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()  # vocabulary-bounded (Heaps)
    )
    v_obs = len(vocab)
    total = int(vocab["n"].sum())
    f1 = int((vocab["n"] == 1).sum())
    f2 = int((vocab["n"] == 2).sum())
    chao1 = v_obs + (f1 * f1) // (2 * f2) if f2 else v_obs + f1 * (f1 - 1) // 2
    return pd.DataFrame(
        [
            {
                "v_obs": v_obs,
                "f1": f1,
                "f2": f2,
                "total_tokens": total,
                "chao1": chao1,
            }
        ]
    ).astype("int64")


CHAO1_VOCAB_SQL = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok)
SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
       CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS f1,
       CAST(COUNT(*) FILTER (WHERE n = 2) AS BIGINT) AS f2,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(CASE WHEN COUNT(*) FILTER (WHERE n = 2) > 0
                 THEN COUNT(*) + (COUNT(*) FILTER (WHERE n = 1)
                                  * COUNT(*) FILTER (WHERE n = 1))
                      // (2 * COUNT(*) FILTER (WHERE n = 2))
                 ELSE COUNT(*) + (COUNT(*) FILTER (WHERE n = 1)
                                  * (COUNT(*) FILTER (WHERE n = 1) - 1)) // 2
            END AS BIGINT) AS chao1
FROM vocab
"""


# -- term burstiness (Church-Gale) --------------------------------------------


def burstiness_terms(sf_dir: str, k: int = 20) -> "object":
    """Church-Gale term burstiness for the top-k document-frequency terms:
    content words arrive in bursts (a doc that mentions a term mentions it
    again), function words don't — the classic adaptation/IDF-vs-burstiness
    diagnostic for tokenizer and stopword design.  Sufficient statistics
    per term over CONTAINING docs: df, tf, sum of squared per-doc counts;
    burstiness = tf/df and the Fano dispersion are emitted as cleared
    integers (fano_num = df*sumsq - tf^2 over fano_den = tf*df), never
    floats.

    Distributed shape: per-doc counts complete inside one batch (row =
    doc), so a map-side combiner emits per-token (df, tf, sumsq) partials
    and the global groupby runs over the VOCABULARY (Heaps-bounded), not
    the corpus; sort+limit on that bounded table.  The final 20-row Fano
    arithmetic happens in exact Python ints; the int64 cast raises on
    overflow exactly like the oracle's HUGEINT -> BIGINT."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        df_c: Counter = Counter()
        tf_c: Counter = Counter()
        sq_c: Counter = Counter()
        for text in t.column("text").to_pylist():
            c = Counter(TOKEN_RE.findall(text.lower()))
            for tok, n in c.items():
                df_c[tok] += 1
                tf_c[tok] += n
                sq_c[tok] += n * n
        toks = list(df_c.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df_p": pa.array([df_c[t_] for t_ in toks], pa.int64()),
                "tf_p": pa.array([tf_c[t_] for t_ in toks], pa.int64()),
                "sq_p": pa.array([sq_c[t_] for t_ in toks], pa.int64()),
            }
        )

    top = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(
            Sum("df_p", alias_name="df"),
            Sum("tf_p", alias_name="tf"),
            Sum("sq_p", alias_name="sumsq"),
        )
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()  # k rows
    )
    fano = [
        int(d) * int(s) - int(t_) * int(t_)
        for d, t_, s in zip(top["df"], top["tf"], top["sumsq"])
    ]
    out = pd.DataFrame(
        {
            "token": top["token"].astype(str),
            "df": top["df"].astype("int64"),
            "tf": top["tf"].astype("int64"),
            "sumsq": top["sumsq"].astype("int64"),
            "fano_num": pd.array(fano, dtype=object),
        }
    )
    out["fano_num"] = out["fano_num"].astype("int64")  # raises on overflow
    return out.reset_index(drop=True)


BURSTINESS_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), dc AS (
  SELECT tok, doc_id, CAST(COUNT(*) AS HUGEINT) AS c FROM tok GROUP BY 1, 2
), st AS (
  SELECT tok AS token, COUNT(*) AS df, SUM(c) AS tf, SUM(c*c) AS sumsq
  FROM dc GROUP BY 1
)
SELECT token, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
       CAST(sumsq AS BIGINT) AS sumsq,
       CAST(df*sumsq - tf*tf AS BIGINT) AS fano_num
FROM st ORDER BY df DESC, token LIMIT 20
"""


# -- cross-lingual vocabulary overlap -------------------------------------------


def lang_vocab_jaccard(sf_dir: str) -> "object":
    """Pairwise EXACT vocabulary Jaccard between languages — the
    cross-lingual contamination signal (a high en/de token overlap says
    the lang labels leak or the corpus code-switches; loanword rates for
    free).  Output: (lang_a, lang_b, n_inter, n_union) for every lang
    pair (a < b), zero-filled, as cleared integers.

    Distributed shape: batch-local distinct (token, lang) combiner ->
    ONE crc32(token)-bucket co-location (all copies of a (token, lang)
    land together, so in-kernel dedup is global) -> per-bucket pandas
    self-merge per token emits pair partials plus per-lang vocab-size
    partials on the same exchange; the global fold is O(|langs|^2).  The
    vocab axis never leaves the bucket kernel (Heaps-bounded buckets)."""
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from ._util import n_buckets

    nb = n_buckets(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * 50)

    def partial(t: pa.Table) -> pd.DataFrame:
        seen = set()
        for lang, text in zip(
            t.column("lang").to_pylist(), t.column("text").to_pylist()
        ):
            for tok in TOKEN_RE.findall(text.lower()):
                seen.add((tok, lang))
        toks = [x[0] for x in seen]
        return pd.DataFrame(
            {
                "gb": pd.Series(
                    [zlib.crc32(x.encode()) % nb for x in toks], dtype="int32"
                ),
                "tok": pd.Series(toks, dtype="object"),
                "lang": pd.Series([x[1] for x in seen], dtype="object"),
            }
        )

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["tok", "lang"])
        # per-lang vocab-size partials
        sizes = g.groupby("lang", sort=False).size()
        # per-token lang pairs
        m = g.merge(g, on="tok")
        m = m[m["lang_x"] < m["lang_y"]]
        pairs = (
            m.groupby(["lang_x", "lang_y"], sort=False).size().reset_index(name="c")
        )
        out_a = list(pairs["lang_x"]) + list(sizes.index)
        out_b = list(pairs["lang_y"]) + [""] * len(sizes)
        out_c = list(pairs["c"]) + list(sizes)
        return pd.DataFrame(
            {
                "la": pd.Series(out_a, dtype="object"),
                "lb": pd.Series(out_b, dtype="object"),
                "c": pd.Series(out_c, dtype="int64"),
            }
        )

    parts = (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(bucket_fold, batch_format="pandas")
        .groupby(["la", "lb"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # O(|langs|^2)
    )
    sizes = {
        r.la: int(r.c) for r in parts[parts["lb"] == ""].itertuples()
    }
    inter = {
        (r.la, r.lb): int(r.c)
        for r in parts[parts["lb"] != ""].itertuples()
    }
    langs = sorted(sizes)
    rows = []
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            ii = inter.get((a, b), 0)
            rows.append(
                {
                    "lang_a": a,
                    "lang_b": b,
                    "n_inter": ii,
                    "n_union": sizes[a] + sizes[b] - ii,
                }
            )
    out = pd.DataFrame(rows)
    out["n_inter"] = out["n_inter"].astype("int64")
    out["n_union"] = out["n_union"].astype("int64")
    return out.reset_index(drop=True)


LANG_VOCAB_JACCARD_SQL = """
WITH tl AS (
  SELECT DISTINCT lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
), sizes AS (
  SELECT lang, COUNT(*) AS n FROM tl GROUP BY 1
), grid AS (
  SELECT a.lang AS la, b.lang AS lb, a.n AS na, b.n AS nb_
  FROM sizes a JOIN sizes b ON a.lang < b.lang
), inter AS (
  SELECT a.lang AS la, b.lang AS lb, COUNT(*) AS c
  FROM tl a JOIN tl b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT g.la AS lang_a, g.lb AS lang_b,
       CAST(COALESCE(i.c, 0) AS BIGINT) AS n_inter,
       CAST(g.na + g.nb_ - COALESCE(i.c, 0) AS BIGINT) AS n_union
FROM grid g LEFT JOIN inter i ON i.la = g.la AND i.lb = g.lb
ORDER BY lang_a, lang_b
"""


# -- token-mass concentration -----------------------------------------------


def token_gini(sf_dir: str) -> "object":
    """Exact Gini coefficient of per-document token counts — the corpus
    concentration KPI (how much of the token mass lives in a few giant
    docs; drives chunking and packing policy).  Cleared integers from the
    length HISTOGRAM: with distinct lengths v (count c) in ascending
    order and s the 1-based start rank of v's run, the rank-weighted sum
    is S1 = sum v*(c*s + c*(c-1)/2), and G = (2*S1 - (n+1)*T) / (n*T) —
    emitted as (n_docs, total_tokens, gini_num, gini_den).  ONE
    domain-bounded fold (the doclen_percentiles shape); driver arithmetic
    is O(distinct lengths) in exact Python ints."""
    import pandas as pd

    from ray.data.aggregate import Count

    def lengths(t: pa.Table) -> pa.Table:
        n = [len(TOKEN_RE.findall(x.lower())) for x in t.column("text").to_pylist()]
        return pa.table({"n_tokens": pa.array(n, pa.int64())})

    hist = (
        _read_docs(sf_dir, ["text"])
        .map_batches(lengths, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()  # O(distinct lengths)
        .sort_values("n_tokens")
    )
    n = int(hist["cnt"].sum())
    T = 0
    S1 = 0
    s = 1  # 1-based start rank of the current run
    for v, c in zip(hist["n_tokens"], hist["cnt"]):
        v, c = int(v), int(c)
        T += v * c
        S1 += v * (c * s + c * (c - 1) // 2)
        s += c
    out = pd.DataFrame(
        {
            "n_docs": [n],
            "total_tokens": [T],
            "gini_num": [2 * S1 - (n + 1) * T],
            "gini_den": [n * T],
        }
    )
    return out.astype("int64")


TOKEN_GINI_SQL = """
WITH l AS (
  SELECT len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS v
  FROM documents
), h AS (
  SELECT v, CAST(COUNT(*) AS HUGEINT) AS c FROM l GROUP BY v
), r AS (
  SELECT v, c,
         COALESCE(SUM(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS s
  FROM h
), agg AS (
  SELECT SUM(c) AS n, SUM(v * c) AS t,
         SUM(v * (c * s + c * (c - 1) // 2)) AS s1
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(t AS BIGINT) AS total_tokens,
       CAST(2 * s1 - (n + 1) * t AS BIGINT) AS gini_num,
       CAST(n * t AS BIGINT) AS gini_den
FROM agg
"""


# -- tokenizer fairness ---------------------------------------------------------


def bytes_per_token_by_lang(sf_dir: str) -> "object":
    """Tokenizer-fairness KPI: characters spent per token by language —
    the per-language cost ratio that decides whether a tokenizer taxes
    some languages (the 'tokenizer premium').  Emitted as cleared
    integers (lang, n_docs, n_chars, n_tokens); the ratio is
    n_chars/n_tokens.  One map-side combiner into an O(|langs|) fold."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_pylist()
        texts = t.column("text").to_pylist()
        toks = [len(TOKEN_RE.findall(x.lower())) for x in texts]
        chars = [len(x) for x in texts]
        folded = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "d": pa.array([1] * len(langs), pa.int64()),
                "ch": pa.array(chars, pa.int64()),
                "tk": pa.array(toks, pa.int64()),
            }
        )
        return pa.TableGroupBy(folded, "lang").aggregate(
            [("d", "sum"), ("ch", "sum"), ("tk", "sum")]
        )

    out = (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("d_sum", alias_name="n_docs"),
            Sum("ch_sum", alias_name="n_chars"),
            Sum("tk_sum", alias_name="n_tokens"),
        )
        .to_pandas()  # O(|langs|)
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "n_chars", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out


BYTES_PER_TOKEN_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(text)) AS BIGINT) AS n_chars,
       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9_]+')))
            AS BIGINT) AS n_tokens
FROM documents GROUP BY lang ORDER BY lang
"""


# -- quantile normalization map --------------------------------------------------

_QNORM_DECILES = tuple(range(10, 100, 10))


def quantile_norm_chars(sf_dir: str) -> "object":
    """Quantile-normalization map for document length by source: each
    source's decile values of ``n_chars`` next to the corpus-global decile
    at the same rank — the lookup table that equalizes length
    distributions across sources before mixing (the bioinformatics
    quantile-norm recipe applied to corpus curation).  Lower-rank
    convention k = (n-1)*q // 100 on both engines.  ONE (source, n_chars)
    histogram fold (value domain bounded); driver order statistics in
    exact ints.  Output: (source, decile, src_value, global_value)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count

    hist = (
        _read_docs(sf_dir, ["source", "n_chars"])
        .groupby(["source", "n_chars"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # O(|sources| x distinct lengths)
    )

    def decile_values(sub: "pd.DataFrame") -> dict[int, int]:
        sub = sub.sort_values("n_chars")
        vals = sub["n_chars"].to_numpy(np.int64)
        cnts = sub["c"].to_numpy(np.int64)
        n = int(cnts.sum())
        cum = cnts.cumsum()
        out = {}
        for q in _QNORM_DECILES:
            k = (n - 1) * q // 100  # 0-based lower rank
            out[q] = int(vals[np.searchsorted(cum, k + 1)])
        return out

    glob = decile_values(
        hist.groupby("n_chars", as_index=False)["c"].sum().assign(
            n_chars=lambda d: d["n_chars"]
        )
    )
    rows = []
    for src, sub in hist.groupby("source"):
        dv = decile_values(sub)
        for q in _QNORM_DECILES:
            rows.append(
                {"source": src, "decile": q, "src_value": dv[q],
                 "global_value": glob[q]}
            )
    out = pd.DataFrame(sorted(rows, key=lambda r: (r["source"], r["decile"])))
    for c in ("decile", "src_value", "global_value"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


QUANTILE_NORM_CHARS_SQL = """
WITH r AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
), g AS (
  SELECT n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS rk,
         COUNT(*) OVER () AS n
  FROM documents
), qs AS (SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90]) AS decile),
sv AS (
  SELECT r.source, q.decile, MAX(r.n_chars) AS src_value
  FROM r JOIN qs q ON r.rk = (r.n - 1) * q.decile // 100
  GROUP BY 1, 2
), gv AS (
  SELECT q.decile, MAX(g.n_chars) AS global_value
  FROM g JOIN qs q ON g.rk = (g.n - 1) * q.decile // 100
  GROUP BY 1
)
SELECT sv.source, CAST(sv.decile AS BIGINT) AS decile,
       CAST(sv.src_value AS BIGINT) AS src_value,
       CAST(gv.global_value AS BIGINT) AS global_value
FROM sv JOIN gv USING (decile)
ORDER BY source, decile
"""


# -- effective vocabulary size ---------------------------------------------------


def effective_vocab(sf_dir: str) -> "object":
    """Effective vocabulary size (inverse-Simpson / perplexity-of-unigram
    order 2): T^2 / sum(tf^2) — how many tokens the corpus behaves as if
    it used, the single number complementing ``chao1_vocab`` (unseen
    types) and ``heaps_vocab_growth`` (growth curve).  Emitted as the
    cleared fraction (n_tokens, n_types, eff_num = T^2, eff_den =
    sum tf^2) so no float ever appears; int64 casts raise on overflow
    like the HUGEINT oracle.  One Heaps-bounded vocab fold."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for text in t.column("text").to_pylist():
            counts.update(TOKEN_RE.findall(text.lower()))
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    tf = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t["n"].to_numpy(zero_copy_only=False).astype(object)
        return pa.table(
            {
                "t": pa.array([int((n).sum())], pa.int64()),
                "ty": pa.array([len(n)], pa.int64()),
                "sq": pa.array([int((n * n).sum())], pa.int64()),
            }
        )

    # per-block scalar partials -> O(blocks) driver sum
    agg = tf.map_batches(fold, batch_format="pyarrow").to_pandas()
    T = int(agg["t"].sum())
    types = int(agg["ty"].sum())
    sq = int(agg["sq"].sum())
    out = pd.DataFrame(
        {
            "n_tokens": [T],
            "n_types": [types],
            "eff_num": [T * T],
            "eff_den": [sq],
        }
    )
    out = out.astype("int64")  # raises on overflow, like the oracle
    return out


EFFECTIVE_VOCAB_SQL = """
WITH tf AS (
  SELECT tok, CAST(COUNT(*) AS HUGEINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        FROM documents)
  GROUP BY tok
)
SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(n) * SUM(n) AS BIGINT) AS eff_num,
       CAST(SUM(n * n) AS BIGINT) AS eff_den
FROM tf
"""


# -- RAKE keyword extraction -----------------------------------------------------


def rake_keywords(sf_dir: str, k: int = 20) -> "object":
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal runs of non-stopword tokens, each word scores
    deg(w)/freq(w) where freq counts the word's occurrences in phrases
    and deg sums the LENGTH of every phrase it occurs in (words that
    live in long multi-word phrases rank up — the co-occurrence degree
    heuristic that made RAKE the cheap keyphrase baseline).  Scores
    emit as floored milli-units so the (score DESC, word) top-k
    hash-matches.  Per-batch (word, freq, deg) combiners into one
    Heaps-bounded vocab groupby — the ``vocab_topk`` shape with a
    two-int payload.  Output: (word, freq, deg, score_milli)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    stop = set(STOPWORDS)

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        freq: Counter = Counter()
        deg: Counter = Counter()
        for text in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            run: list[str] = []
            for tok in toks + [next(iter(stop))]:  # sentinel flushes tail
                if tok in stop:
                    if run:
                        L = len(run)
                        for w in run:
                            freq[w] += 1
                            deg[w] += L
                        run = []
                else:
                    run.append(tok)
        words = sorted(freq)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "f": pa.array([freq[w] for w in words], pa.int64()),
                "d": pa.array([deg[w] for w in words], pa.int64()),
            }
        )

    m = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("f", alias_name="freq"), Sum("d", alias_name="deg"))
        .to_pandas()  # Heaps-bounded vocabulary rows
    )
    m["score_milli"] = (1000 * m["deg"]) // m["freq"]
    m = m.sort_values(
        ["score_milli", "word"], ascending=[False, True]
    ).head(k)
    out = m[["word", "freq", "deg", "score_milli"]].reset_index(drop=True)
    for c in ("freq", "deg", "score_milli"):
        out[c] = out[c].astype("int64")
    return out


RAKE_KEYWORDS_SQL = f"""
WITH docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
  FROM documents
), toks AS (
  SELECT doc_id, l[u.i] AS tok, u.i
  FROM docs, unnest(range(1, len(l) + 1)) AS u(i)
), marked AS (
  SELECT doc_id, tok, i,
         SUM(CASE WHEN tok IN {STOPWORDS} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i) AS seg
  FROM toks
), phrase_words AS (
  SELECT doc_id, seg, tok,
         COUNT(*) OVER (PARTITION BY doc_id, seg) AS plen
  FROM marked WHERE tok NOT IN {STOPWORDS}
), scores AS (
  SELECT tok AS word, COUNT(*) AS freq, SUM(plen) AS deg
  FROM phrase_words GROUP BY tok
)
SELECT word, CAST(freq AS BIGINT) AS freq, CAST(deg AS BIGINT) AS deg,
       CAST((1000 * deg) // freq AS BIGINT) AS score_milli
FROM scores ORDER BY score_milli DESC, word LIMIT 20
"""


# -- readability audit -----------------------------------------------------------


def readability_by_lang(sf_dir: str) -> "object":
    """ARI-style READABILITY audit per language: sentences = runs of
    [.!?] (min 1 per doc), words = the corpus token convention, and the
    automated readability index emitted as the exact floored centi-unit
    fraction ari_centi = floor((471*C*S + 50*W^2 - 2143*W*S) / (W*S))
    over the per-language totals (chars C = word characters, W words, S
    sentences) — the mixed chars/word + words/sentence fractions share
    the common denominator W*S so the floor happens once.  Quality-
    filtering signal for mixed-language corpora (wildly off-scale ARI =
    boilerplate or tokenizer mismatch).  One bounded per-language moment
    fold.  Output: (lang, n_docs, n_words, n_sents, n_chars,
    ari_centi)."""
    import re as _re

    import pandas as pd

    from ray.data.aggregate import Sum

    sent_re = _re.compile(r"[.!?]+")

    def moments(t: pa.Table) -> pa.Table:
        langs, nd, nw, ns, nc = [], [], [], [], []
        for lang, text in zip(
            t.column("lang").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall(text.lower())
            sents = max(1, len(sent_re.findall(text)))
            langs.append(lang)
            nd.append(1)
            nw.append(len(toks))
            ns.append(sents)
            nc.append(sum(len(w) for w in toks))
        folded = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "nd": pa.array(nd, pa.int64()),
                "nw": pa.array(nw, pa.int64()),
                "ns": pa.array(ns, pa.int64()),
                "nc": pa.array(nc, pa.int64()),
            }
        )
        return pa.TableGroupBy(folded, "lang").aggregate(
            [("nd", "sum"), ("nw", "sum"), ("ns", "sum"), ("nc", "sum")]
        )

    m = (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("nd_sum", alias_name="n_docs"),
                   Sum("nw_sum", alias_name="n_words"),
                   Sum("ns_sum", alias_name="n_sents"),
                   Sum("nc_sum", alias_name="n_chars"))
        .to_pandas()  # O(|langs|)
    )
    rows = []
    for r in m.itertuples():
        W, S, C = int(r.n_words), int(r.n_sents), int(r.n_chars)
        num = 471 * C * S + 50 * W * W - 2143 * W * S
        den = W * S
        ari = (num - ((num % den) + den) % den) // den if den else 0
        rows.append(
            {"lang": r.lang, "n_docs": int(r.n_docs), "n_words": W,
             "n_sents": S, "n_chars": C, "ari_centi": ari}
        )
    out = pd.DataFrame(sorted(rows, key=lambda x: x["lang"]))
    for c in ("n_docs", "n_words", "n_sents", "n_chars", "ari_centi"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


READABILITY_BY_LANG_SQL = """
WITH per_doc AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w,
         GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(array_to_string(
             regexp_extract_all(lower(text), '[a-z0-9_]+'), '')) AS c
  FROM documents
), m AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(w) AS HUGEINT) AS nw, CAST(SUM(s) AS HUGEINT) AS ns,
         CAST(SUM(c) AS HUGEINT) AS nc
  FROM per_doc GROUP BY lang
), f AS (
  SELECT lang, n_docs, nw, ns, nc,
         471 * nc * ns + 50 * nw * nw - 2143 * nw * ns AS num,
         nw * ns AS den
  FROM m
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(nw AS BIGINT) AS n_words, CAST(ns AS BIGINT) AS n_sents,
       CAST(nc AS BIGINT) AS n_chars,
       CAST(CASE WHEN den = 0 THEN 0
            ELSE (num - ((num % den) + den) % den) // den END
            AS BIGINT) AS ari_centi
FROM f ORDER BY lang
"""


# -- language-router F1 scorecard -------------------------------------------------


def langid_f1(sf_dir: str) -> "object":
    """Per-language F1 scorecard over the LangId router — the metric
    layer on ``langid_confusion`` (the confusion matrix says where it
    errs, this says whether each branch is trustworthy): per true
    language tp/fp/fn and the single-floor exact
    f1_ppm = 1e6 * 2*tp // (2*tp + fp + fn), plus the micro-averaged
    'ALL' row (for single-label multiclass, micro-F1 == accuracy).
    Composes the confusion pipeline's <= |langs|^2-row output — one
    driver fold, no new pass.  Output: (lang, tp, fp, fn, f1_ppm)."""
    import pandas as pd

    cm = langid_confusion(sf_dir).to_pandas()
    langs = sorted(set(cm["lang"]) | set(cm["pred_lang"]))
    n_true = cm.groupby("lang")["n"].sum()
    n_pred = cm.groupby("pred_lang")["n"].sum()
    diag = cm[cm["lang"] == cm["pred_lang"]].set_index("lang")["n"]
    rows = []
    tot_tp = tot_fp = tot_fn = 0
    for lang in langs:
        tp = int(diag.get(lang, 0))
        fp = int(n_pred.get(lang, 0)) - tp
        fn = int(n_true.get(lang, 0)) - tp
        den = 2 * tp + fp + fn
        rows.append(
            {"lang": lang, "tp": tp, "fp": fp, "fn": fn,
             "f1_ppm": (2_000_000 * tp) // den if den else 0}
        )
        tot_tp += tp
        tot_fp += fp
        tot_fn += fn
    den = 2 * tot_tp + tot_fp + tot_fn
    rows.append(
        {"lang": "ALL", "tp": tot_tp, "fp": tot_fp, "fn": tot_fn,
         "f1_ppm": (2_000_000 * tot_tp) // den if den else 0}
    )
    out = pd.DataFrame(sorted(rows, key=lambda r: r["lang"]))
    for c in ("tp", "fp", "fn", "f1_ppm"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


LANGID_F1_SQL = f"""
WITH cm AS ({LANGID_CONFUSION_SQL.replace("ORDER BY 1, 2", "")}
), langs AS (
  SELECT lang FROM cm UNION SELECT pred_lang FROM cm
), per AS (
  SELECT l.lang,
         COALESCE((SELECT SUM(n) FROM cm
                   WHERE cm.lang = l.lang AND cm.pred_lang = l.lang), 0)
           AS tp,
         COALESCE((SELECT SUM(n) FROM cm WHERE cm.pred_lang = l.lang), 0)
           - COALESCE((SELECT SUM(n) FROM cm
                       WHERE cm.lang = l.lang AND cm.pred_lang = l.lang), 0)
           AS fp,
         COALESCE((SELECT SUM(n) FROM cm WHERE cm.lang = l.lang), 0)
           - COALESCE((SELECT SUM(n) FROM cm
                       WHERE cm.lang = l.lang AND cm.pred_lang = l.lang), 0)
           AS fn
  FROM langs l
), allrow AS (
  SELECT 'ALL' AS lang, SUM(tp) AS tp, SUM(fp) AS fp, SUM(fn) AS fn FROM per
), u AS (
  SELECT * FROM per UNION ALL SELECT * FROM allrow
)
SELECT lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
            ELSE (2000000 * tp) // (2 * tp + fp + fn) END AS BIGINT)
         AS f1_ppm
FROM u ORDER BY lang
"""
