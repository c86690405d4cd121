"""HTML main-content extraction (boilerplate strip) — the web-document
side of the extraction surface (north rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; the PDF/layout half is the span-table
engine, pipelines/extract.py).

Input synthesis: there is no HTML corpus in the driver tables, so each
``documents`` row is wrapped into a deterministic full HTML page
(``synth_html`` — a pure function of (doc_id, text, source), the
fixtures.py pattern): head with style/script junk, header with a logo
image and a nav menu, a link-heavy sidebar, a cookie banner, a footer —
and the document text as ``<p>`` paragraphs of ``PARA_WORDS`` words inside
an ``<article>``, with ``doc_id % 3`` content images interleaved after the
first paragraphs (interleaved text+media, per the corpus contract).

Extraction is a genuine boilerplate classifier, NOT an inverse of the
synthesis: a stdlib ``html.parser`` DOM walk (Boilerpipe/JusText-style,
both published) that (a) suppresses script/style and the semantic
boilerplate containers header/nav/footer/aside, and (b) drops any
remaining text block whose link density exceeds ``LINK_DENSITY_MAX``
(kills the cookie banner without knowing its class) or whose text is
empty.  Images survive only outside suppressed containers.  The extractor
never sees the synthesis rules — the correctness gate is that the kept
blocks re-join EXACTLY to the original document text (oracle:
``SELECT doc_id, text FROM documents``), i.e. the heuristics must achieve
perfect precision/recall on the planted boilerplate, not approximately.

Scale: synthesis + parse + strip run fused in ONE actor-pool
``map_batches`` over the column-pruned documents read — no shuffle at all;
per-doc HTML never leaves the task (at 10^12 docs the HTML form is ~3x
the text bytes — materializing it would triple the scan).  The parser is
constructed once per actor (``__init__``), reset per document.

Reference parity: the reference's page-sequential plugin routing
(eplan_pdf_plugin.py) is the PDF analogue; this module is the engine
addition covering the web-extraction tier.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

import ray.data
from ray.data import Dataset

PARA_WORDS = 12          # words per synthesized <p>
LINK_DENSITY_MAX = 0.33  # JusText-style boilerplate cut
_SUPPRESS = {"head", "script", "style", "header", "nav", "footer", "aside"}
_BLOCK = {"p", "div", "article", "section", "body", "li", "h1", "h2", "h3"}


# -- deterministic page synthesis (pure function; fixtures.py pattern) -------

def n_content_imgs(doc_id: int) -> int:
    return doc_id % 3


def synth_html(doc_id: int, text: str, source: str) -> str:
    """Wrap one document's text into a full deterministic HTML page."""
    words = text.split(" ")
    paras = [
        " ".join(words[i: i + PARA_WORDS])
        for i in range(0, len(words), PARA_WORDS)
    ]
    m = n_content_imgs(doc_id)
    body: list[str] = []
    for j, p in enumerate(paras):
        body.append(f"<p>{p}</p>")
        if j < m:
            body.append(f'<img src="media/img_{doc_id}_{j}.png">')
    for j in range(len(paras), m):  # leftover images after the last para
        body.append(f'<img src="media/img_{doc_id}_{j}.png">')
    junk = " ".join(f"promo{(doc_id + k) % 7}" for k in range(4))
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>Doc {doc_id}</title>"
        "<style>body{margin:0} .x{color:red}</style>"
        f"<script>var docId={doc_id};track();</script>"
        "</head><body>"
        '<header><img src="media/logo.png">'
        '<nav><a href="/">Home</a> <a href="/about">About</a> '
        '<a href="/contact">Contact</a></nav></header>'
        f'<aside><h3>Related</h3><a href="/r1">{junk}</a> '
        '<a href="/r2">more</a> <a href="/r3">links</a></aside>'
        '<div class="consent">This site uses cookies '
        '<a href="#accept">Accept all cookies</a> '
        '<a href="#decline">Manage preferences</a></div>'
        f"<article>{''.join(body)}</article>"
        f'<footer>(c) 2026 {source} <a href="/terms">Terms</a> '
        '<a href="/privacy">Privacy</a></footer>'
        "</body></html>"
    )


# -- the boilerplate-strip classifier ---------------------------------------

class _MainContentParser(HTMLParser):
    """DOM walk collecting (text block, link-char count) spans plus images,
    suppressing semantic boilerplate containers; block decisions happen in
    ``finish`` via link density.  Span order is document order."""

    def reset_doc(self) -> None:
        self.reset()
        self.spans: list[tuple[str, str]] = []  # (kind, payload)
        self._depth_suppress = 0
        self._a_depth = 0
        self._buf: list[str] = []
        self._link_chars = 0

    # block boundaries flush the current text buffer as one candidate
    def _flush(self) -> None:
        txt = "".join(self._buf)
        total = len(txt)
        if total and txt.strip():
            dens = self._link_chars / total
            if dens <= LINK_DENSITY_MAX:
                self.spans.append(("text", txt.strip()))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SUPPRESS:
            self._depth_suppress += 1
            return
        if self._depth_suppress:
            return
        if tag in _BLOCK:
            self._flush()
        elif tag == "a":
            self._a_depth += 1
        elif tag == "img":
            self._flush()
            src = dict(attrs).get("src", "")
            self.spans.append(("media", src))

    def handle_endtag(self, tag):
        if tag in _SUPPRESS:
            self._depth_suppress = max(0, self._depth_suppress - 1)
            return
        if self._depth_suppress:
            return
        if tag in _BLOCK:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data):
        if self._depth_suppress:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len(data)

    def close_doc(self) -> list[tuple[str, str]]:
        self._flush()
        self.close()
        return self.spans


class HtmlExtractor:
    """Actor-pool stage: synthesize the page, parse, strip boilerplate.
    One parser per actor; per-doc Python is inherent to HTML parsing (the
    same contract as the span-extraction actors, pipelines/extract.py)."""

    def __init__(self, emit: str = "doc"):
        self.parser = _MainContentParser()
        self.emit = emit

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        srcs = t.column("source").to_pylist()
        if self.emit == "doc":
            out_text, out_media = [], []
            for d, x, s in zip(ids, texts, srcs):
                spans = self._extract(synth_html(int(d), x, s))
                out_text.append(
                    " ".join(p for k, p in spans if k == "text")
                )
                out_media.append(sum(1 for k, _ in spans if k == "media"))
            return pa.table(
                {
                    "doc_id": pa.array([int(i) for i in ids], pa.int64()),
                    "main_text": pa.array(out_text, pa.string()),
                    "n_media": pa.array(out_media, pa.int64()),
                }
            )
        rows_d, rows_s, rows_k, rows_c = [], [], [], []
        for d, x, s in zip(ids, texts, srcs):
            for seq, (k, payload) in enumerate(
                self._extract(synth_html(int(d), x, s))
            ):
                rows_d.append(int(d))
                rows_s.append(seq)
                rows_k.append(k)
                rows_c.append(payload)
        return pa.table(
            {
                "doc_id": pa.array(rows_d, pa.int64()),
                "seq": pa.array(rows_s, pa.int64()),
                "kind": pa.array(rows_k, pa.string()),
                "content": pa.array(rows_c, pa.string()),
            }
        )

    def _extract(self, html: str) -> list[tuple[str, str]]:
        self.parser.reset_doc()
        self.parser.feed(html)
        return self.parser.close_doc()


def _docs(sf_dir: str) -> Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )


def html_main_content(sf_dir: str) -> Dataset:
    """Strip each synthesized page back to its main content.  The gate is
    EXACT round-trip: main_text must equal the original text (the planted
    boilerplate — nav, sidebar, cookie banner, footer, logo — carries zero
    surviving characters) and n_media must count only content images."""
    return _docs(sf_dir).map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"emit": "doc"},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


HTML_MAIN_CONTENT_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, text AS main_text,
       CAST(doc_id % 3 AS BIGINT) AS n_media
FROM documents
ORDER BY doc_id
"""


def html_spans(sf_dir: str) -> Dataset:
    """The interleaved span sequence per document — (doc_id, seq, kind,
    content) with kind in (text, media) in document order; the HTML-side
    analogue of the PDF engine's span-sequence equality surface.  The
    oracle reconstructs the expected sequence from first principles
    (word-chunk paragraphs + the deterministic image placement), so the
    extractor's ordering, not just its content set, is hash-gated."""
    return _docs(sf_dir).map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"emit": "spans"},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


HTML_SPANS_SQL = f"""
WITH words AS (
  SELECT doc_id, l[i] AS w, i
  FROM (
    SELECT doc_id, STRING_SPLIT(text, ' ') AS l,
           UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) + 1)) AS i
    FROM documents
  )
),
paras AS (
  SELECT doc_id, CAST((i - 1) // {PARA_WORDS} AS BIGINT) AS p,
         STRING_AGG(w, ' ' ORDER BY i) AS ptext
  FROM words GROUP BY doc_id, (i - 1) // {PARA_WORDS}
),
np AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY doc_id),
text_spans AS (
  SELECT paras.doc_id,
         p + LEAST(p, paras.doc_id % 3) AS seq,
         'text' AS kind, ptext AS content
  FROM paras
),
media_spans AS (
  SELECT np.doc_id,
         j + LEAST(j + 1, n_paras) AS seq,
         'media' AS kind,
         'media/img_' || np.doc_id || '_' || j || '.png' AS content
  FROM np, UNNEST(RANGE(0, 3)) AS r(j)
  WHERE j < np.doc_id % 3
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(seq AS BIGINT) AS seq,
       kind, content
FROM (SELECT * FROM text_spans UNION ALL SELECT * FROM media_spans)
ORDER BY doc_id, seq
"""
