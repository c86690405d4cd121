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
