"""Deterministic synthetic span-corpus generator (FIXTURES.md §1-§4).

Generates the BASELINE input_hint table
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
purely from ``(doc_id, seed)`` — no external data, identical output on every
engine and every run.  The corpus exercises every page type plus the dirty
paths: footer-incomplete tags, pin chains, duplicate tags across documents,
invalid tags, empty key cells, ';'-list fan-outs, ffill placeholders,
unknown-type pages, footer-less pages, missing-table pages, and interleaved
media spans.

Scale note: generation is per-document and embarrassingly parallel; the
bench harness materializes the corpus once via a Ray ``map_batches`` over a
range dataset (see pipelines/corpus.py) and the timed pipeline reads the
resulting parquet.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

from .spandoc import US

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))]
)

# Shared small vocabularies so identical tags recur across documents and the
# dedup/merge path is exercised corpus-wide.
_FUNCS = [f"F{i:02d}" for i in range(1, 9)]
_LOCS = [f"L{i}" for i in range(1, 7)]
_DEVS = [f"D{i:02d}" for i in range(1, 25)] + [f"K{i}" for i in range(1, 9)]
_CABLES = [f"W{i:03d}" for i in range(1, 31)]
_STRIPS = [f"X{i}" for i in range(1, 7)]
_COLORS = ["BK", "BU", "RD", "GN", "WH", "YE"]
_XSECT = ["0.5", "0.75", "1.5", "2.5"]

_PAGE_KINDS = [
    "CONNECTION_LIST", "DEVICE_TAG_LIST", "CABLE_OVERVIEW", "TOPOLOGY",
    "WIRES_PART_LIST", "CABLE_DIAGRAM", "PLC_DIAGRAM",
    "STRUCTURE_IDENTIFIER_OVERVIEW", "TERMINAL_DIAGRAM",
    "UNKNOWN", "NO_FOOTER", "NO_TABLE", "CHAR_OVERLAP",
]
_PAGE_WEIGHTS = [14, 12, 10, 8, 10, 10, 8, 6, 8, 4, 3, 3, 3]

_SEARCH_NAMES = {
    "CONNECTION_LIST": "Connection list",
    "DEVICE_TAG_LIST": "device tag list",
    "CABLE_OVERVIEW": "Cable overview",
    "TOPOLOGY": "Topology: Routed cables / connections",
    "WIRES_PART_LIST": "Wires parts list",
    "CABLE_DIAGRAM": "Cable diagram",
    "PLC_DIAGRAM": "PLC diagram",
    "STRUCTURE_IDENTIFIER_OVERVIEW": "Structure identifier overview",
    "TERMINAL_DIAGRAM": "Terminal diagram",
    "CHAR_OVERLAP": "Connection list",  # classifies as CONNECTION_LIST
}


def _doc_rng(doc_id: str, seed: int) -> random.Random:
    digest = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def _full_tag(rng: random.Random) -> str:
    return f"={rng.choice(_FUNCS)}+{rng.choice(_LOCS)}-{rng.choice(_DEVS)}"


def _partial_tag(rng: random.Random) -> str:
    """Footer-incomplete tag: missing higher levels, completed by the footer."""
    r = rng.random()
    if r < 0.5:
        return f"-{rng.choice(_DEVS)}"
    if r < 0.8:
        return f"+{rng.choice(_LOCS)}-{rng.choice(_DEVS)}"
    return f"={rng.choice(_FUNCS)}-{rng.choice(_DEVS)}"


def _tag(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.55:
        return _full_tag(rng)
    if r < 0.85:
        return _partial_tag(rng)
    if r < 0.92:
        return " " + _full_tag(rng)  # leading space: unstripped-GUID path
    return f"JUNK{rng.randrange(10)}"  # invalid: text before first separator


def _pin(rng: random.Random) -> str:
    if rng.random() < 0.25:
        return f"{rng.randrange(1, 9)}:{rng.randrange(1, 5)}"  # pin chain
    return str(rng.randrange(1, 17))


def _cable(rng: random.Random) -> str:
    return f"={rng.choice(_FUNCS)}+{rng.choice(_LOCS)}-{rng.choice(_CABLES)}"


class _PageBuilder:
    """Accumulates one page's spans with running offsets."""

    def __init__(self, doc_id: str, page_no: int, offset0: int):
        self.doc_id = doc_id
        self.page_no = page_no
        self.spans: list[dict] = []
        self._off = offset0

    def add(self, kind: str, text: str = "", media_ref: str = ""):
        self.spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": self._off}
        )
        self._off += 1

    def title(self, text: str):
        self.add("title", text)

    def footer(self, rng: random.Random, project="Proj-A"):
        self.add("footer_cell", f"project{US}{project}")
        self.add("footer_cell", f"product{US}Prod-{rng.choice('ABC')}")
        # hierarchy slots: a function level, a location level, sometimes a
        # '&' document level (ignored by the merge) or an invalid entry
        self.add("footer_cell", f"0:0{US}={rng.choice(_FUNCS)}")
        self.add("footer_cell", f"2:0{US}+{rng.choice(_LOCS)}")
        if rng.random() < 0.3:
            self.add("footer_cell", f"0:1{US}&DOC{rng.randrange(5)}")
        if rng.random() < 0.15:
            self.add("footer_cell", f"2:1{US}notatag")
        if rng.random() < 0.1:
            self.add("footer_cell", f"0:2{US}/S{rng.randrange(3)}")

    def cell(self, table: str, row: int, col: int, value: str):
        self.add("cell", f"{table}{US}{row}{US}{col}{US}{value}")

    def row(self, table: str, row: int, values: list):
        """None values emit no span (a genuinely missing cell)."""
        for col, v in enumerate(values):
            if v is not None:
                self.cell(table, row, col, v)

    def text_roi(self, key: str, value: str):
        self.add("text", f"{key}{US}{value}")

    def char_run(self, table: str, row: int, chars: list[tuple[str, float, float]]):
        """Raw positioned character run (the overlap split/repair input)."""
        spec = ";".join(f"{ord(c)}:{x0:g}:{x1:g}" for c, x0, x1 in chars)
        self.add("char_run", f"{table}{US}{row}{US}{spec}")

    def media(self, idx: int):
        self.add(
            "media", "", f"media/{self.doc_id}/p{self.page_no}/img{idx}.png"
        )


def _maybe_empty(rng: random.Random, value: str, p: float = 0.08) -> str:
    return "" if rng.random() < p else value


def _build_connection_list(b: _PageBuilder, rng: random.Random):
    n = rng.randrange(3, 9)
    for r in range(n):
        src = _maybe_empty(rng, f"{_tag(rng)}:{_pin(rng)}")
        dst = _maybe_empty(rng, f"{_tag(rng)}:{_pin(rng)}")
        if rng.random() < 0.1:
            src = _tag(rng)  # no pin -> "one/no pins specified" warning
        b.row(
            "main", r,
            [f"w{rng.randrange(99)}", src, dst,
             rng.choice(_COLORS), rng.choice(_XSECT)],
        )


def _build_device_tag_list(b: _PageBuilder, rng: random.Random):
    for r in range(rng.randrange(3, 10)):
        b.row(
            "main", r,
            [_maybe_empty(rng, _tag(rng)), str(rng.randrange(1, 5)),
             f"Device {rng.randrange(50)}", f"T-{rng.randrange(900)}",
             rng.choice(["ACME", "Globex", "Initech", ""]),
             f"P{rng.randrange(10000):05d}"],
        )


def _build_cable_overview(b: _PageBuilder, rng: random.Random):
    cable = _cable(rng)
    for r in range(rng.randrange(3, 9)):
        if rng.random() < 0.3 and r > 0:
            ct = ""  # ffill placeholder: inherits previous cable
        else:
            cable = _cable(rng)
            ct = cable
        b.row(
            "main", r,
            [ct, f"x{r}", _maybe_empty(rng, _tag(rng)),
             _maybe_empty(rng, _tag(rng)),
             rng.choice(["H05VV", "LIYY", ""]), str(rng.randrange(2, 12)),
             rng.choice(_XSECT), f"{rng.randrange(1, 40)}m",
             rng.choice(["supply", "signal", ""])],
        )


def _build_topology(b: _PageBuilder, rng: random.Random):
    for r in range(rng.randrange(2, 6)):
        srcs = ";".join(_tag(rng) for _ in range(rng.randrange(1, 3)))
        dsts = ";".join(_tag(rng) for _ in range(rng.randrange(1, 3)))
        route = ";".join(
            f"TR{rng.randrange(20)}" for _ in range(rng.randrange(1, 4))
        )
        b.row(
            "main", r,
            [_maybe_empty(rng, _cable(rng)), f"P{rng.randrange(1000)}",
             f"T{rng.randrange(100)}", str(rng.randrange(1, 60)),
             srcs, str(rng.randrange(1, 9)), route,
             dsts, str(rng.randrange(1, 9))],
        )


def _build_wires_part_list(b: _PageBuilder, rng: random.Random):
    for r in range(rng.randrange(3, 8)):
        b.row(
            "main", r,
            [_maybe_empty(rng, f"{_tag(rng)}:{_pin(rng)}"),
             _maybe_empty(rng, f"{_tag(rng)}:{_pin(rng)}"),
             f"P{rng.randrange(10000):05d}", rng.choice(_XSECT),
             rng.choice(_COLORS), f"{rng.randrange(1, 20)}m",
             f"B{rng.randrange(9)}", "", "ferrule", "ferrule",
             "up", "down",
             ";".join(f"TR{rng.randrange(20)}"
                      for _ in range(rng.randrange(0, 3)))],
        )


def _build_cable_diagram(b: _PageBuilder, rng: random.Random):
    """Raw block-structured table: marker pair + header + data rows per cable
    (the block splitter in tables.shape_cable_diagram consumes this)."""
    cols = ["Function text Src", "Page / Column Src", "src_tag", "src_pin",
            "Conductor", "dst_tag", "dst_pin", "Page / Column Dst",
            "Function text Dst"]
    r = 0
    for _ in range(rng.randrange(1, 4)):  # blocks
        cable = _cable(rng)
        b.row("main", r, [f"Cable unit: {cable}", None, None, "", "",
                          "", "", "", ""])
        b.row("main", r + 1, [f"Type {rng.choice(['LIYY', 'H05VV'])}", None,
                              None, "", "", "", "", "", ""])
        b.row("main", r + 2, cols)  # repeated header row
        r += 3
        ft_src = f"feed {rng.randrange(30)}"
        for _k in range(rng.randrange(2, 6)):
            ft = ft_src if _k == 0 or rng.random() < 0.4 else "="
            b.row(
                "main", r,
                [ft, f"{rng.randrange(1, 9)}/{rng.randrange(1, 9)}",
                 _tag(rng), str(rng.randrange(1, 9)), rng.choice(_COLORS),
                 _tag(rng), str(rng.randrange(1, 9)),
                 f"{rng.randrange(1, 9)}/{rng.randrange(1, 9)}",
                 f"load {rng.randrange(30)}"],
            )
            r += 1


def _build_plc_diagram(b: _PageBuilder, rng: random.Random):
    tag = _full_tag(rng)
    ft = f"ctrl {rng.randrange(20)}"
    for r in range(rng.randrange(3, 9)):
        if rng.random() < 0.35 and r > 0:
            t = ""  # ffill placeholder: same device continues
        else:
            tag = _full_tag(rng)
            t = tag
        b.row(
            "main", r,
            [t, f"%I{rng.randrange(10)}.{rng.randrange(8)}",
             f"rack{rng.randrange(4)}",
             ft if r == 0 or rng.random() < 0.5 else "=",
             str(rng.randrange(4)), str(rng.randrange(16)),
             f"SYM_{rng.randrange(100)}", str(rng.randrange(1, 20))],
        )


def _build_structure_overview(b: _PageBuilder, rng: random.Random):
    for r in range(rng.randrange(2, 7)):
        choice = rng.random()
        if choice < 0.5:
            t = f"={rng.choice(_FUNCS)}"
        elif choice < 0.8:
            t = f"+{rng.choice(_LOCS)}"
        else:
            t = f"={rng.choice(_FUNCS)}+{rng.choice(_LOCS)}"  # composite -> warn
        b.row("main", r, [t, f"i{r}", f"struct desc {rng.randrange(40)}"])


def _build_terminal_diagram(b: _PageBuilder, rng: random.Random):
    strip = f"+{rng.choice(_LOCS)}-{rng.choice(_STRIPS)}"
    b.text_roi("strip_tag", strip)
    n_cables = rng.randrange(2, 6)
    l_cables = [_cable(rng) for _ in range(n_cables)]
    r_cables = [_cable(rng) for _ in range(n_cables)]
    for i, c in enumerate(l_cables):
        b.row("l_cables", i, [f"ig{i}", c, "x"])
    for i, c in enumerate(r_cables):
        b.row("r_cables", i, [f"ig{i}", c, "x"])
    n = rng.randrange(2, 7)
    ft = f"term {rng.randrange(20)}"
    for r in range(n):
        # l_conn: Function text + 11 digit color columns ("" = no wire)
        lrow = [ft if r == 0 else rng.choice(["=", ft])]
        for k in range(1, 12):
            lrow.append(
                rng.choice(_COLORS) if k <= n_cables and rng.random() < 0.5
                else ""
            )
        b.row("l_conn", r, lrow)
        # r_conn: 11 digit columns (reversed header order) + Page / column
        rrow = []
        for k in range(11, 0, -1):
            rrow.append(
                rng.choice(_COLORS) if k <= n_cables and rng.random() < 0.5
                else ""
            )
        rrow.append(f"{rng.randrange(1, 9)}/{rng.randrange(1, 9)}")
        b.row("r_conn", r, rrow)
        # main: src device -> strip pin -> dst device
        b.row(
            "main", r,
            [_tag(rng), str(rng.randrange(1, 9)), str(r + 1),
             "" if rng.random() < 0.8 else f"J{rng.randrange(4)}",
             "" if rng.random() < 0.7 else f"%Q{rng.randrange(8)}.{r}",
             _tag(rng), str(rng.randrange(1, 9))],
        )


def _spread_chars(
    text: str, x0: float, width: float
) -> list[tuple[str, float, float]]:
    step = width / max(1, len(text))
    return [
        (c, x0 + i * step, x0 + (i + 1) * step) for i, c in enumerate(text)
    ]


def _build_char_overlap(b: _PageBuilder, rng: random.Random):
    """A CONNECTION_LIST page whose raw span surface carries colliding
    character runs: the overlap split (M4) dumps two text blocks, the repair
    (M5) re-places them by center into the Color / Cross-section cells,
    overwriting the tabled values and emitting the reference's INFO records
    — or, when the second block drifts past the table edge, the
    'could not repair (fully)' WARNING."""
    _build_connection_list(b, rng)
    r = rng.randrange(0, 3)
    t1 = rng.choice(_COLORS)
    t2 = rng.choice(_XSECT)
    # col 3 (Color) spans x [300,400); col 4 (Cross-section) [400,500)
    chars = _spread_chars(t1, 330.0, 40.0)  # block 1: center ~350 -> col 3
    if rng.random() < 0.3:
        # second block stretches past the right table edge: center > 500
        # falls in no cell -> the 'could not repair (fully)' WARNING half
        chars += [(t2[0], 340.0, 360.0)] + _spread_chars(t2[1:], 600.0, 80.0)
    else:
        chars += _spread_chars(t2, 365.0, 80.0)  # center ~405 -> col 4
    b.char_run("main", r, chars)


_BUILDERS = {
    "CONNECTION_LIST": _build_connection_list,
    "DEVICE_TAG_LIST": _build_device_tag_list,
    "CABLE_OVERVIEW": _build_cable_overview,
    "TOPOLOGY": _build_topology,
    "WIRES_PART_LIST": _build_wires_part_list,
    "CABLE_DIAGRAM": _build_cable_diagram,
    "PLC_DIAGRAM": _build_plc_diagram,
    "STRUCTURE_IDENTIFIER_OVERVIEW": _build_structure_overview,
    "TERMINAL_DIAGRAM": _build_terminal_diagram,
    "CHAR_OVERLAP": _build_char_overlap,
}


def doc_spans(doc_id: str, seed: int = 42, pathological_rate: float = 0.02) -> list[dict]:
    """All spans of one document, as Arrow-ready dicts."""
    rng = _doc_rng(doc_id, seed)
    if rng.random() < pathological_rate:
        n_pages = rng.randrange(100, 250)  # skew driver (north_rule)
    else:
        n_pages = rng.randrange(1, 9)
    spans: list[dict] = []
    offset = 0
    for page_no in range(n_pages):
        b = _PageBuilder(doc_id, page_no, offset)
        b.add("page_break")
        kind = rng.choices(_PAGE_KINDS, weights=_PAGE_WEIGHTS, k=1)[0]
        if kind == "UNKNOWN":
            b.title(f"Unknown page {rng.randrange(40)}")
            b.footer(rng)
        elif kind == "NO_FOOTER":
            b.title(rng.choice(list(_SEARCH_NAMES.values())))
            # project slot empty -> footer extraction returns None
            b.add("footer_cell", f"product{US}Prod-X")
        elif kind == "NO_TABLE":
            b.title(rng.choice(list(_SEARCH_NAMES.values())))
            b.footer(rng)
            # no cell spans at all -> missing-table FAULT path
        else:
            name = _SEARCH_NAMES[kind]
            # exercise the case/space-insensitive title match
            styled = rng.choice([name, name.upper(), name.lower(), f"  {name} "])
            b.title(styled)
            b.footer(rng)
            _BUILDERS[kind](b, rng)
        if rng.random() < 0.5:
            for i in range(rng.randrange(1, 4)):
                b.media(i)
        spans.extend(b.spans)
        offset = spans[-1]["offset"] + 1
    return spans


def corpus_batch(doc_ids: list[str], seed: int = 42) -> pa.Table:
    """Arrow table of generated documents — usable directly inside
    ``map_batches`` for distributed corpus materialization."""
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(
                [doc_spans(d, seed) for d in doc_ids], pa.list_(SPAN_STRUCT)
            ),
        },
        schema=DOCS_SCHEMA,
    )


def corpus_table(n_docs: int, seed: int = 42) -> pa.Table:
    """Small in-memory corpus for tests."""
    return corpus_batch([f"doc-{i:06d}" for i in range(n_docs)], seed)
