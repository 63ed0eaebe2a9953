"""Chunked-write parity (reference tokeniser.js:111-125: ``pos`` persists
across write() calls, so callers stream by passing the growing buffer; the
final write is followed by end()).  Per the reference's own caveat, chunks
must not split non-text tokens; cuts below land after '>' (token boundary)
and mid-text (data tokens split and re-coalesce identically)."""

import pytest

from htmlgraft import Parser, Tokeniser, print_tree


def _chunked(html: str, cuts):
    p = Parser()
    t = Tokeniser(p)
    for cut in sorted(cuts):
        t.write(html[:cut])
    t.write(html)
    t.end_input()
    return print_tree(p.document)


def _oneshot(html: str):
    p = Parser()
    t = Tokeniser(p)
    t.parse(html)
    return print_tree(p.document)


CASES = [
    "<p>one<p>two<b>bold</b> done",
    "<table><tr><td>a<td>b</table>after",
    "<div>words and <a href=x>links</a> here</div>",
    "<!doctype html><html><head><title>t</title></head><body>x",
    "<pre>text &amp; more &#65; end</pre>",
]


def _safe_cuts(html):
    # after every '>' (token just closed) plus one mid-text split per gap
    cuts = [i + 1 for i, c in enumerate(html) if c == ">"]
    mids = [
        c + 2 for c in cuts
        if c + 2 < len(html) and html[c] not in "<&" and html[c + 1] not in "<&"
    ]
    return cuts, mids


@pytest.mark.parametrize("html", CASES)
def test_growing_buffer_equals_oneshot(html):
    want = _oneshot(html)
    cuts, mids = _safe_cuts(html)
    assert _chunked(html, cuts) == want, cuts
    assert _chunked(html, mids) == want, mids
    assert _chunked(html, cuts + mids) == want
