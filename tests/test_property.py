"""Property-based tests (hypothesis) for the pure parsing/GUID core."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from indu_doc_transformer_ray import core
from indu_doc_transformer_ray.core import (
    default_config,
    rebuild_tag_display,
    tag_parts,
    try_parse_tag,
)

VALUE = st.text(
    alphabet=string.ascii_uppercase + string.digits, min_size=1, max_size=6
)
SEP = st.sampled_from(["=", "+", "-", "/"])  # ':' strips, '&' footer-ignored


@st.composite
def well_formed_tags(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    return "".join(draw(SEP) + draw(VALUE) for _ in range(n))


@given(well_formed_tags())
@settings(max_examples=200)
def test_parse_rebuild_roundtrip(tag):
    """Parsing a well-formed tag and rebuilding in config order yields a tag
    that re-parses to the same parts (display rebuild is a fixpoint)."""
    parts = try_parse_tag(tag, default_config)
    assert parts is not None and parts != {}
    rebuilt = rebuild_tag_display(parts, default_config)
    assert try_parse_tag(rebuilt, default_config) == parts


@given(well_formed_tags())
@settings(max_examples=200)
def test_parse_covers_all_values(tag):
    """Every drawn value appears in the parse output exactly as often as it
    was inserted."""
    parts = try_parse_tag(tag, default_config)
    n_values = sum(len(v) for v in parts.values())
    n_seps = sum(tag.count(s) for s in ("=", "+", "-", "/"))
    assert n_values == n_seps


@given(st.text(min_size=0, max_size=30))
@settings(max_examples=300)
def test_parse_never_crashes(s):
    """Arbitrary text: parser returns {} (empty), None (invalid) or a dict —
    never raises; tag_parts always returns a dict."""
    out = try_parse_tag(s, default_config)
    assert out is None or isinstance(out, dict)
    assert isinstance(tag_parts(s, default_config), dict)


@given(well_formed_tags(), st.lists(well_formed_tags(), max_size=3))
@settings(max_examples=200)
def test_footer_merge_idempotent(tag, footer_tags):
    """Merging an already-merged tag with the same footer changes nothing
    (the first present level stops the prepend walk)."""
    once = core.merge_tag_with_footer(tag, footer_tags, default_config)
    twice = core.merge_tag_with_footer(once, footer_tags, default_config)
    assert once == twice


@given(st.text(alphabet=string.printable, min_size=0, max_size=40))
@settings(max_examples=300)
def test_guid_deterministic_and_uuid_shaped(s):
    g1 = core.xtarget_guid(s)
    g2 = core.xtarget_guid(s)
    assert g1 == g2
    parts = g1.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
    int(g1.replace("-", ""), 16)  # valid hex


@given(st.lists(st.text(alphabet="ab;", min_size=0, max_size=5), min_size=1,
                max_size=4))
@settings(max_examples=200)
def test_routing_guid_order_insensitive(tracks):
    """The reference sorts tracks before hashing (attributes.py:373-381):
    any permutation yields the same GUID."""
    import itertools

    guids = {
        core.routing_attr_guid("route", list(p))
        for p in itertools.permutations(tracks)
    }
    assert len(guids) == 1


@st.composite
def char_runs(draw):
    """Random monotone-ish char runs with planted overlaps."""
    n = draw(st.integers(min_value=1, max_value=12))
    chars = []
    x = 0.0
    for _ in range(n):
        if chars and draw(st.booleans()) and draw(st.booleans()):
            # overlap: jump left of the previous char's right edge
            x = max(0.0, x - draw(st.floats(min_value=5.0, max_value=30.0)))
        w = draw(st.floats(min_value=1.0, max_value=20.0))
        c = draw(st.sampled_from(string.ascii_lowercase))
        chars.append((c, x, x + w))
        x = x + w
    return chars


@given(char_runs())
@settings(max_examples=200)
def test_split_char_run_preserves_text(chars):
    """M4 invariant: the split never loses or reorders characters — the
    concatenated block texts equal the input char sequence."""
    from indu_doc_transformer_ray.tables import split_char_run

    blocks = split_char_run(chars, 0.0, 10.0)
    assert "".join(b[4] for b in blocks) == "".join(c for c, _x0, _x1 in chars)
    # block x-extents are within the run's envelope
    xs = [x for _c, x0, x1 in chars for x in (x0, x1)]
    for x0, _y0, x1, _y1, _t in blocks:
        assert min(xs) <= x0 and x1 <= max(xs)


@given(st.sets(st.text(alphabet=string.ascii_lowercase, min_size=1,
                       max_size=8), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)  # first call pays numpy import
def test_minhash_sig_deterministic_and_elementwise(sh):
    """Signature is deterministic, order-insensitive, and each lane is the
    min over singleton-lane signatures (the min-hash lattice property)."""
    from indu_doc_transformer_ray.functions.dedup import N_HASHES, _minhash_sig

    sig = _minhash_sig(sh)
    assert sig == _minhash_sig(set(sorted(sh)))
    assert len(sig) == N_HASHES
    singles = [_minhash_sig({s}) for s in sh]
    for lane in range(N_HASHES):
        assert sig[lane] == min(s[lane] for s in singles)


@given(st.dictionaries(
    st.sampled_from(["CONNECTION_LIST", "CABLE_OVERVIEW", "PLC_DIAGRAM"]),
    st.lists(st.tuples(
        st.text(alphabet=string.ascii_letters, min_size=1, max_size=8),
        st.booleans(),
        st.one_of(st.none(), st.sampled_from(["", "="])),
    ), min_size=1, max_size=6, unique_by=lambda t: t[0]),
    min_size=1, max_size=3,
))
@settings(max_examples=100, deadline=None)
def test_pagesettings_specs_roundtrip(cfg):
    """Arbitrary spec sets survive specs -> settings -> JSON text ->
    settings -> specs unchanged (S4 round-trip as a property,
    filesystem-free)."""
    from indu_doc_transformer_ray.pagemodel import (
        ColumnSpec,
        PageSpec,
        PageType,
        TableSpec,
    )
    from indu_doc_transformer_ray.pagesettings import (
        PageSettings,
        page_specs_from_settings,
        settings_from_page_specs,
    )

    class _Mem(PageSettings):
        def save(self):  # keep the property test filesystem-free
            pass

        def load(self):
            self.pages_setup = {}

    specs = {}
    for name, cols in cfg.items():
        pt = PageType[name]
        specs[pt] = PageSpec(
            pt, f"search {name}",
            (TableSpec("main", tuple(ColumnSpec(*c) for c in cols)),),
        )
    m = _Mem("<mem>", pages_setup={})
    m.pages_setup = settings_from_page_specs(
        specs, "/tmp/_prop_pagesettings.json"
    ).pages_setup
    back = _Mem("<mem>", pages_setup={})
    back.from_json(m.to_json())
    assert page_specs_from_settings(back) == specs


SPAN_KINDS = st.sampled_from(
    ["page_break", "title", "footer_cell", "cell", "char_run", "text",
     "media", "garbage_kind"]
)
SPAN_TEXT = st.text(
    alphabet=string.printable + "\x1f\x1e", min_size=0, max_size=40
)


@st.composite
def raw_spans(draw):
    from indu_doc_transformer_ray.spandoc import Span

    n = draw(st.integers(min_value=0, max_value=40))
    return [
        Span(draw(SPAN_KINDS), draw(SPAN_TEXT), "", i) for i in range(n)
    ]


@given(raw_spans())
@settings(max_examples=300, deadline=None)
def test_arbitrary_spans_never_crash(spans):
    """Dirty-corpus guarantee: any byte-garbage span sequence flows through
    split -> classify -> table build -> emit without raising — failures
    surface as error RECORDS, never exceptions (the reference's error
    envelope, table_extractor.py:183-216)."""
    from indu_doc_transformer_ray import emit
    from indu_doc_transformer_ray.core import default_config
    from indu_doc_transformer_ray.spandoc import split_pages
    from indu_doc_transformer_ray.store import ExtractionStore

    store = ExtractionStore(default_config)
    for page in split_pages(spans):
        emit.process_page("doc-fuzz", page, store)
    # error log rows are well-formed (doc, page, severity, message)
    for d, p, sev, msg in store.error_log:
        assert d == "doc-fuzz" and isinstance(p, int) and isinstance(msg, str)
        assert sev in ("INFO", "WARNING", "FAULT", "UNKNOWN_ERROR")


@st.composite
def classified_garbage_pages(draw):
    """Pages that PASS classification+footer, then hit the table builder
    with garbage cell/char_run payloads."""
    from indu_doc_transformer_ray.pagemodel import PAGE_SPECS
    from indu_doc_transformer_ray.spandoc import US, Span

    spans = [Span("page_break", "", "", 0)]
    spec = draw(st.sampled_from(sorted(PAGE_SPECS.values(),
                                       key=lambda s: str(s.page_type))))
    spans.append(Span("title", spec.search_name, "", 1))
    spans.append(Span("footer_cell", f"project{US}P", "", 2))
    spans.append(Span("footer_cell", f"product{US}M", "", 3))
    off = 4
    n = draw(st.integers(min_value=0, max_value=25))
    for _ in range(n):
        kind = draw(st.sampled_from(["cell", "char_run", "text"]))
        body = draw(st.text(alphabet=string.printable + "\x1f", max_size=30))
        spans.append(Span(kind, body, "", off))
        off += 1
    return spans


@given(classified_garbage_pages())
@settings(max_examples=300, deadline=None)
def test_classified_pages_with_garbage_tables_never_crash(spans):
    from indu_doc_transformer_ray import emit
    from indu_doc_transformer_ray.core import default_config
    from indu_doc_transformer_ray.spandoc import split_pages
    from indu_doc_transformer_ray.store import ExtractionStore

    store = ExtractionStore(default_config)
    for page in split_pages(spans):
        emit.process_page("doc-fuzz2", page, store)


# -- pareto frontier mask vs O(n^2) dominance --------------------------------

@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=200)
def test_frontier_mask_matches_bruteforce(points):
    import numpy as np

    from indu_doc_transformer_ray.functions.relational import _frontier_mask

    price = np.array([p for p, _ in points], dtype=np.int64)
    size = np.array([s for _, s in points], dtype=np.int64)
    got = _frontier_mask(price, size)
    for i in range(len(points)):
        dominated = any(
            (price[j] <= price[i] and size[j] >= size[i]
             and (price[j] < price[i] or size[j] > size[i]))
            for j in range(len(points))
        )
        assert got[i] == (not dominated), (i, points)


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1, max_size=60,
    ),
    st.integers(1, 5),
)
@settings(max_examples=100)
def test_frontier_mask_batch_lossless(points, nchunks):
    """Pruning per chunk then pruning the union equals pruning globally —
    the property the distributed tree fold relies on."""
    import numpy as np

    from indu_doc_transformer_ray.functions.relational import _frontier_mask

    price = np.array([p for p, _ in points], dtype=np.int64)
    size = np.array([s for _, s in points], dtype=np.int64)
    glob = {(int(p), int(s)) for p, s in
            zip(price[_frontier_mask(price, size)],
                size[_frontier_mask(price, size)])}
    surv_p, surv_s = [], []
    for c in range(nchunks):
        pp, ss = price[c::nchunks], size[c::nchunks]
        if len(pp) == 0:
            continue
        m = _frontier_mask(pp, ss)
        surv_p.extend(pp[m])
        surv_s.extend(ss[m])
    sp = np.array(surv_p, dtype=np.int64)
    ssz = np.array(surv_s, dtype=np.int64)
    m = _frontier_mask(sp, ssz)
    folded = {(int(p), int(s)) for p, s in zip(sp[m], ssz[m])}
    assert folded == glob


# -- edit-distance-1 verifier vs full DP --------------------------------------

def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


@given(
    st.text(alphabet="abc0", max_size=8),
    st.text(alphabet="abc0", max_size=8),
)
@settings(max_examples=500)
def test_is_edit1_matches_dp(a, b):
    from indu_doc_transformer_ray.functions.dedup import _is_edit1

    if a == b:
        return  # callers only probe distinct strings
    assert _is_edit1(a, b) == (_lev(a, b) == 1)


@given(st.text(alphabet="abcd", min_size=1, max_size=10), st.data())
@settings(max_examples=300)
def test_deletion_neighborhood_blocks_every_edit1_pair(s, data):
    """The SymSpell pigeonhole the exact-recall claim rests on: any string
    at edit distance 1 from s shares a member of the two single-deletion
    neighborhoods (identity included)."""
    pos = data.draw(st.integers(0, len(s)))
    op = data.draw(st.sampled_from(["sub", "ins", "del"]))
    ch = data.draw(st.sampled_from("abcdX"))
    if op == "sub" and pos < len(s):
        t = s[:pos] + ch + s[pos + 1:]
    elif op == "ins":
        t = s[:pos] + ch + s[pos:]
    elif op == "del" and len(s) > 0 and pos < len(s):
        t = s[:pos] + s[pos + 1:]
    else:
        return
    if t == s:
        return

    def hood(x):
        out = {x}
        for i in range(len(x)):
            out.add(x[:i] + x[i + 1:])
        return out

    assert hood(s) & hood(t), (s, t)


# -- z-order interleave: per-dimension monotonicity ---------------------------

@given(
    st.integers(0, (1 << 16) - 1),
    st.integers(0, (1 << 16) - 1),
    st.integers(0, (1 << 16) - 1),
)
@settings(max_examples=300)
def test_zorder_monotone_per_dimension(a, b, delta):
    """Fixing one dimension, the Morton key strictly increases with the
    other — the property that makes zbucket ranges prunable for
    single-column predicates."""
    import numpy as np

    def z(x, y):
        xv = np.array([x], dtype=np.uint64)
        yv = np.array([y], dtype=np.uint64)
        out = np.zeros(1, dtype=np.uint64)
        for i in range(16):
            out |= ((xv >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
            out |= ((yv >> np.uint64(i)) & np.uint64(1)) << np.uint64(
                2 * i + 1
            )
        return int(out[0])

    a2 = min(a + delta, (1 << 16) - 1)
    b2 = min(b + delta, (1 << 16) - 1)
    if a2 > a:
        assert z(a2, b) > z(a, b)
    if b2 > b:
        assert z(a, b2) > z(a, b)


@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_repetition_kernel_matches_naive_counter(texts):
    """The production np.unique packed-token-id kernel
    (text._repetition_signals, the exact function the operator maps) must
    equal a naive Counter reference on arbitrary small texts (ties, empty
    docs, single tokens, all-identical tokens)."""
    from collections import Counter

    from indu_doc_transformer_ray.functions.text import (
        TOKEN_RE,
        _repetition_signals,
    )

    for t in texts:
        toks = TOKEN_RE.findall(t.lower())
        tris = [" ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))]
        bis = [" ".join(toks[i : i + 2]) for i in range(max(0, len(toks) - 1))]
        tc, bc = Counter(tris), Counter(bis)
        want = (
            len(tris) if len(toks) >= 2 else max(0, len(toks) - 2),
            sum(c for c in tc.values() if c > 1),
            sum(c * len(g) for g, c in tc.items() if c > 1),
            max((c * len(g) for g, c in bc.items()), default=0),
        )
        assert _repetition_signals(toks) == want, (t, want)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_hindex_fold_matches_naive(pairs):
    """The vectorized grouped H-index kernel (kcore's per-round fold)
    equals the naive per-owner definition: largest h with ≥h values ≥ h."""
    import numpy as np

    from indu_doc_transformer_ray.functions import similarity  # facade
    from indu_doc_transformer_ray.functions.graph import _hindex_fold_arrays

    uu = np.array([p[0] for p in pairs], np.int64)
    vals = np.array([p[1] for p in pairs], np.int64)
    owners, hs = _hindex_fold_arrays(uu, vals)
    got = dict(zip(owners.tolist(), hs.tolist()))

    want = {}
    for o in set(uu.tolist()):
        vs = sorted((int(v) for u, v in pairs if u == o), reverse=True)
        want[o] = max(
            (min(i + 1, v) for i, v in enumerate(vs)), default=0
        )
    assert got == want


@given(st.integers(min_value=1, max_value=(1 << 52)))
@settings(max_examples=300, deadline=None)
def test_ddsketch_bucket_invariants(v):
    """DDSketch bucket laws for any positive value: the index is monotone
    in v (via rep ≤ v), rep is the bucket's lower bound, and the bucket's
    relative width is ≤ 1/16 (v < rep·17/16 for large buckets, exact for
    small)."""
    import numpy as np

    from indu_doc_transformer_ray.functions.sketches import _dd_rep

    bl = int(np.frexp(np.float64(v))[1])
    if v < 32:
        idx = v
    else:
        idx = 32 + (bl - 6) * 16 + ((v >> (bl - 5)) & 15)
    rep = _dd_rep(int(idx))
    assert rep <= v
    if v < 32:
        assert rep == v
    else:
        assert v * 16 < rep * 17


# -- session-9 kernel laws (pure arithmetic, no Ray) --------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 1_000), st.integers(0, 10_000)),
        min_size=1,
        max_size=200,
    ),
    st.integers(1, 7),
)
@settings(max_examples=100)
def test_carry_independent_sweep_matches_global_scan(deltas, n_buckets):
    """peak_concurrency's bucket decomposition: splitting the delta
    stream into ANY contiguous time buckets and folding (total,
    max_prefix, n_at_max, first_t) per bucket with a driver carry chain
    equals the single global prefix scan."""
    import numpy as np

    t = np.array(sorted(d[0] for d in deltas), dtype=np.int64)
    d = np.array([x[1] % 7 - 3 for x in deltas], dtype=np.int64)
    # fold equal times (global truth)
    ut, idx = np.unique(t, return_index=True)
    sums = np.add.reduceat(d, idx)
    c = sums.cumsum()
    peak = int(c.max())
    n_at = int((c == peak).sum())
    first = int(ut[c == peak].min())
    # bucketed replay
    width = max(1, (int(ut.max()) - int(ut.min()) + 1) // n_buckets + 1)
    tb = (ut - ut.min()) // width
    bmax, bn, bfirst, btot = {}, {}, {}, {}
    for b in np.unique(tb):
        m = tb == b
        cc = sums[m].cumsum()
        mx = int(cc.max())
        bmax[b] = mx
        bn[b] = int((cc == mx).sum())
        bfirst[b] = int(ut[m][cc == mx].min())
        btot[b] = int(sums[m].sum())
    carry = 0
    gmax = None
    for b in sorted(bmax):
        v = carry + bmax[b]
        if gmax is None or v > gmax:
            gmax, gn, gfirst = v, bn[b], bfirst[b]
        elif v == gmax:
            gn += bn[b]
            gfirst = min(gfirst, bfirst[b])
        carry += btot[b]
    assert (gmax, gn, gfirst) == (peak, n_at, first)


@given(
    st.lists(st.integers(1, 30), min_size=2, max_size=60),
)
@settings(max_examples=100)
def test_hodges_lehmann_convolution_matches_brute_pairs(vals):
    """hodges_lehmann_qty's histogram convolution == brute-force Walsh
    pair enumeration (i<j), including the lower-median rank rule."""
    import numpy as np
    from collections import Counter

    # brute force
    sums = sorted(
        vals[i] + vals[j]
        for i in range(len(vals))
        for j in range(i + 1, len(vals))
    )
    rank = (len(sums) - 1) // 2
    want = sums[rank]
    # convolution replay
    h = Counter(vals)
    vs = sorted(h)
    conv: Counter = Counter()
    for i, vi in enumerate(vs):
        ci = h[vi]
        conv[vi + vi] += ci * (ci - 1) // 2
        for vj in vs[i + 1:]:
            conv[vi + vj] += ci * h[vj]
    P = sum(conv.values())
    assert P == len(sums)
    cum = 0
    got = None
    for s_ in sorted(conv):
        cum += conv[s_]
        if cum >= rank + 1:
            got = s_
            break
    assert got == want


@given(
    st.lists(st.integers(1, 200), min_size=2, max_size=8),
)
@settings(max_examples=150)
def test_huffman_merge_rule_optimal(freqs):
    """huffman_code_lengths' deterministic merge rule yields an OPTIMAL
    prefix code: expected length equals the classic heapq construction's
    (ties may differ in shape, never in cost), and Kraft equality holds."""
    import heapq
    from fractions import Fraction

    labels = [f"s{i}" for i in range(len(freqs))]
    # engine rule
    nodes = [(f, l, frozenset([l])) for f, l in zip(freqs, labels)]
    depth = {l: 0 for l in labels}
    while len(nodes) > 1:
        nodes.sort(key=lambda x: (x[0], x[1]))
        (f1, l1, m1), (f2, l2, m2) = nodes[0], nodes[1]
        for s_ in m1 | m2:
            depth[s_] += 1
        nodes = nodes[2:] + [(f1 + f2, min(l1, l2), m1 | m2)]
    cost = sum(f * depth[l] for f, l in zip(freqs, labels))
    # reference heapq construction
    heap = [(f, i, 0, [i]) for i, f in enumerate(freqs)]
    heapq.heapify(heap)
    d2 = [0] * len(freqs)
    tick = len(freqs)
    while len(heap) > 1:
        f1, _, _, m1 = heapq.heappop(heap)
        f2, _, _, m2 = heapq.heappop(heap)
        for i in m1 + m2:
            d2[i] += 1
        heapq.heappush(heap, (f1 + f2, tick, 0, m1 + m2))
        tick += 1
    cost2 = sum(f * d for f, d in zip(freqs, d2))
    assert cost == cost2
    assert sum(Fraction(1, 2 ** depth[l]) for l in labels) == 1
