"""Unit tests for tag parsing, footer merge and GUID recipes.

Expected values are hand-derived from the reference algorithms (tag.py,
configs.py, xtarget.py, connection.py, attributes.py) — including the
reference's own inline asserts (tag.py:430-436) — NOT computed by the code
under test.
"""

import hashlib
import uuid

from indu_doc_transformer_ray import core
from indu_doc_transformer_ray.core import (
    AspectConfig,
    default_config,
    merge_tag_with_footer,
    normalize_string,
    split_pin_tag,
    strip_pin,
    tag_parts,
    try_parse_tag,
)


def md5uuid(s: str) -> str:
    return str(uuid.UUID(bytes=hashlib.md5(s.encode()).digest()))


def test_normalize_string():
    assert normalize_string("  Hello   WORLD  ") == "hello world"
    assert normalize_string("") == ""


def test_split_pin_tag():
    assert split_pin_tag("+A1-M2:1") == ("+A1-M2", ":1")
    assert split_pin_tag("+A1-M2") == ("+A1-M2", None)
    assert split_pin_tag("+A1-M2:1:2") == ("+A1-M2", ":1:2")
    assert strip_pin("=F+L-D:1:2") == "=F+L-D"
    assert strip_pin(" =F ") == " =F "


def test_try_parse_tag_basic():
    # docstring example of the reference parser (tag.py:355-361)
    assert try_parse_tag("+A1-M2", default_config) == {
        "+": ("A1",),
        "-": ("M2",),
    }


def test_try_parse_tag_rejects_leading_text():
    assert try_parse_tag("JUNK=F1", default_config) is None
    assert try_parse_tag("x", default_config) is None


def test_try_parse_tag_empty():
    assert try_parse_tag("", default_config) == {}
    assert try_parse_tag("   ", default_config) == {}


def test_try_parse_tag_repeated_and_empty_values():
    assert try_parse_tag("=A=B", default_config) == {"=": ("A", "B")}
    assert try_parse_tag("=", default_config) == {"=": ("",)}
    assert try_parse_tag("= F1 +L ", default_config) == {
        "=": ("F1",),
        "+": ("L",),
    }


def test_multichar_separators_longest_first():
    # the reference relies on alternation order for overlapping separators
    cfg = AspectConfig.from_pairs(
        [("===", "Functional"), ("==", "Location"), ("=", "Product")]
    )
    assert try_parse_tag("===F==L=P", cfg) == {
        "===": ("F",),
        "==": ("L",),
        "=": ("P",),
    }


def test_separator_ge():
    assert default_config.separator_ge([]) == ["=", "+", "-", ":", "/", "&"]
    assert default_config.separator_ge(["+"]) == ["=", "+"]
    assert default_config.separator_ge(["-", "="]) == ["=", "+", "-"]


def test_tag_parts_fills_higher_levels():
    assert tag_parts("-D1", default_config) == {
        "=": (),
        "+": (),
        "-": ("D1",),
    }
    # failed parse -> {}
    assert tag_parts("junk", default_config) == {}
    # empty tag -> every configured level, empty (reference quirk)
    assert tag_parts("", default_config) == {
        "=": (), "+": (), "-": (), ":": (), "/": (), "&": (),
    }


def test_footer_merge_reference_case():
    # the reference's own inline test (tag.py:424-436)
    cfg = AspectConfig.from_pairs(
        [("===", "Functional"), ("==", "Location"), ("=", "Product")]
    )
    merged = merge_tag_with_footer(
        "=Prod", ["=Prod", "==Loc", "===Func"], cfg
    )
    assert merged == "===Func==Loc=Prod"
    assert tag_parts(merged, cfg) == {
        "=": ("Prod",),
        "==": ("Loc",),
        "===": ("Func",),
    }


def test_footer_merge_default_config():
    # page tag has '-' level; footer provides '=' and '+'
    assert (
        merge_tag_with_footer("-D5", ["=F1", "+L2"], default_config)
        == "=F1+L2-D5"
    )
    # page tag already has '=' -> nothing prepended
    assert (
        merge_tag_with_footer("=F9-D5", ["=F1", "+L2"], default_config)
        == "=F9-D5"
    )
    # '&' level in footer is ignored; invalid footer tags skipped
    assert (
        merge_tag_with_footer("-D5", ["&DOC", "junk", "=F1"], default_config)
        == "=F1-D5"
    )
    # pin part of the page tag is stripped before merging
    assert (
        merge_tag_with_footer("-D5:1:2", ["=F1"], default_config) == "=F1-D5"
    )


def test_guid_xtarget_and_aspect():
    assert core.xtarget_guid("=F1+L2-D5") == md5uuid("=F1+L2-D5")
    assert core.aspect_guid("+", "A1") == md5uuid("+A1")


def test_guid_attributes():
    assert core.simple_attr_guid("Color", "BK") == md5uuid("Color:BK")
    # routing: tracks sorted before join (attributes.py:373-381)
    assert core.routing_attr_guid("route", ["b", "a"]) == md5uuid("route:a;b")
    assert core.plc_attr_guid("%I0.1", {"b": "2", "a": "1"}) == md5uuid(
        "%I0.1:a=1;b=2"
    )
    # pdf location: f-string over the python tuple repr
    assert core.pdf_location_guid(
        "location", 3, (0.0, 10.0, 1000.0, 20.0)
    ) == md5uuid("location:3:(0.0, 10.0, 1000.0, 20.0)")


def test_guid_connection_charjoin():
    # the reference's `list += str` appends per character; ':'.join therefore
    # interleaves ':' between every char of the embedded GUIDs
    src, dst = md5uuid("=A"), md5uuid("=B")
    expected = md5uuid(
        "CONN:" + ":".join(list(src) + list(dst) + ["THROUGH:None"])
    )
    assert core.connection_guid(src, dst, None) == expected


def test_guid_link_charjoin():
    conn = core.connection_guid(None, None, None)
    expected = md5uuid(
        "LINK:"
        + ":".join(
            ["W1"] + list("SRC::1") + list("DEST::2") + list(conn)
        )
    )
    assert core.link_guid("W1", ":1", ":2", conn) == expected


def test_guid_pin_chain():
    link = core.link_guid("W1", ":1", ":2", None)
    chain = core.pin_chain_guids(":1:2", "src", link)
    assert [name for _, name in chain] == ["1", "2"]
    # tail pin: no child
    tail_expected = md5uuid(
        "PIN:" + ":".join(["2"] + list("src") + ["CHILD:None"] + list(link))
    )
    assert chain[1][0] == tail_expected
    # head pin embeds the tail pin's guid char-joined
    head_expected = md5uuid(
        "PIN:"
        + ":".join(["1"] + list("src") + list(tail_expected) + list(link))
    )
    assert chain[0][0] == head_expected
    assert core.pin_chain_guids("no-pin", "src", link) == []


def test_rebuild_tag_display():
    parts = {"-": ("D1",), "=": ("F1",), "+": ("L1", "L2")}
    assert core.rebuild_tag_display(parts, default_config) == "=F1+L1+L2-D1"
