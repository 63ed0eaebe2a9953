"""Selector-engine semantic pins (htmlgraft.domops): matching rules on
constructed documents, ancestor backtracking, synthetic-wrapper
flattening, fail-fast selector parsing, and the Spark operator's
document-order contract.  Oracle-level value agreement for the gated
``dom_select`` query is covered by tests/test_entry.py."""

import pytest

from htmlgraft.domops import parse_selector, select, select_css_df
from htmlgraft.linkops import _parse_doc, _subtree_text


def _sel(doc, sel):
    return [(e.name, _subtree_text(e)) for e in select(doc, parse_selector(sel))]


@pytest.fixture(scope="module")
def doc():
    return _parse_doc(
        b'<!doctype html><html><body>'
        b'<div id=main class="content article">'
        b'<p><b>one</b> two</p><p>three</p></div>'
        b'<table class=meta><tr><td>A<td>B</table>'
        b'<a href="/tos">t</a><a href="/other" class="x y">o</a>'
        b"</body></html>"
    )


def test_tag_id_class_attr_matching(doc):
    assert _sel(doc, "p") == [("p", "one two"), ("p", "three")]
    assert _sel(doc, "#main > p") == [("p", "one two"), ("p", "three")]
    assert _sel(doc, "#main > b") == []          # child, not descendant
    assert _sel(doc, "#main b") == [("b", "one")]
    # subtree text concatenates text nodes with no block separator (the
    # link-anchor collapse convention): 'one two' + 'three'
    assert _sel(doc, "div.content.article") == [("div", "one twothree")]
    assert _sel(doc, "div.content.missing") == []
    assert _sel(doc, ".x.y") == [("a", "o")]
    assert _sel(doc, "[href]") == [("a", "t"), ("a", "o")]
    assert _sel(doc, '[href="/tos"]') == [("a", "t")]
    assert _sel(doc, "a[href='/other'].x") == [("a", "o")]
    assert _sel(doc, "table.meta td") == [("td", "A"), ("td", "B")]
    # '*' sees every real element incl. parser-inserted html/head/tbody
    assert [n for n, _ in _sel(doc, "*")] == [
        "html", "head", "body", "div", "p", "b", "p",
        "table", "tbody", "tr", "td", "td", "a", "a",
    ]


def test_descendant_backtracks_past_nearest_ancestor():
    """'section > span b': b's NEAREST span ancestor has a div parent (a
    greedy right-to-left scan fails there); the match needs the outer
    span, whose parent IS the section."""
    d = _parse_doc(
        b"<section><span><div><span><b>x</b></span></div></span></section>"
    )
    assert _sel(d, "section > span b") == [("b", "x")]
    assert _sel(d, "div > span > b") == [("b", "x")]
    assert _sel(d, "section > div b") == []


def test_reparented_wrapper_is_transparent():
    """Foster-parented content sits inside a synthetic '#reparented'
    wrapper in the stored tree; selector paths must flatten it exactly
    like the reference's traversal flattens it from the event stream."""
    d = _parse_doc(b"<table><span>s</span><tr><td>c</td></tr></table>")
    assert _sel(d, "body span") == [("span", "s")]
    assert _sel(d, "body > span") == [("span", "s")]  # wrapper is no parent
    assert _sel(d, "table span") == []


def test_bad_selectors_fail_fast(spark, sf_dir):
    for bad in ("", ">", "> a", "a >", "a > > b", "[=x]", "#", "a[]"):
        with pytest.raises(ValueError):
            parse_selector(bad)
    # the Spark operator parses on the DRIVER: errors surface at plan
    # build, not inside executor tasks
    from htmlgraft.corpus import pages_df

    with pytest.raises(ValueError):
        select_css_df(pages_df(spark, sf_dir), ["p", "a >"])


def test_spark_operator_document_order(spark, sf_dir):
    """match_pos is 1-based document order per (url, selector): the meta
    table's cells arrive as doc_id, lang, 'more like this'."""
    from htmlgraft.corpus import pages_df

    df = select_css_df(
        pages_df(spark, sf_dir), ["table.meta td"]
    ).toPandas()
    for url, grp in df.groupby("url"):
        g = grp.sort_values("match_pos")
        assert list(g.match_pos) == [1, 2, 3]
        doc_id = url.rsplit("/", 1)[1]
        assert g.text.iloc[0] == doc_id
        assert g.text.iloc[2] == "more like this"
