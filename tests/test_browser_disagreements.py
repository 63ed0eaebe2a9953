"""Hand-pinned expected outputs for the reference's *Browser Disagreements*
suite (/root/reference/test/scripts/samples.js:1307-1316).

These six inputs are the cases where the reference parser's author
DOCUMENTS that real browsers produce a different tree — i.e. exactly the
inputs where "fixing toward WHATWG/browser behavior" would silently break
the byte-identity invariant.  Everywhere else the repo's tree goldens are
REGENERATED from the reference under Node (tools/gen_fixtures.mjs), which
means the fixture generator itself is part of the trusted base; the round-4
review flagged that as the one remaining "same-implementation oracle"
caveat (X4).  This module is the substitute available without a browser:
the expected html5lib-format trees below are COMMITTED LITERALS, hand
transcribed from the reference's output on 2026-08-19 and independently
sanity-read against the suite's intent, so

  * a regression in the fixture generator (or a regenerated-goldens drift)
    can no longer move these expectations, and
  * a future "improvement" toward what browsers do (e.g. keeping ``</br>``
    suppressed inside SVG, closing <p> at <dialog> boundaries per the
    HTML spec, or nesting <keygen> inside <select>) fails HERE with a
    docstring explaining that the deviation is deliberate.

What each case pins (why browsers disagree):
  0. ``<svg>foo</br>bar`` — the reference converts ``</br>`` to ``<br>``
     even in foreign (SVG) content, breaking out of the svg element;
     browsers keep parsing inside the foreign context.
  1. ``foo</body> <!--->`` — after ``</body>``, the reference re-kinds
     trailing space into body and appends the comment to BODY; (some)
     browsers attach after-body comments to <html>.
  2. same, doubled — the second ``</body>`` + space + comment keeps
     appending to body ("foo ", <!---->, " ", <!---->): the after-body
     redirect is stable across repeats.
  3/4. ``<dialog>`` — the reference treats <dialog> like a formatting-
     neutral container: an open <p> does NOT close at ``<dialog>`` in
     case 3 (so <dialog> nests *after* the closed p) and ``</dialog>``
     closes the inner <p> in case 4; browsers' special-tag list differs.
  5. ``<select><keygen>`` — the reference closes <select> at <keygen>
     and makes keygen a sibling; browsers drop or nest it.

If this test and tests/test_parser_goldens.py ever disagree, the committed
literals here win — regenerate fixtures only after confirming the
reference itself (not the generator) changed.
"""

import pytest

from htmlgraft import parse, print_tree

CASES = [
    (
        "svg-br-breakout",
        "<svg>foo</br>bar",
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     <svg>\n'
        '|       "foo"\n'
        '|     <br>\n'
        '|     "bar"\n',
    ),
    (
        "after-body-comment",
        "foo</body> <!--->",
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     "foo "\n'
        '|     <!---->\n',
    ),
    (
        "after-body-comment-repeat",
        "foo</body> <!---></body> <!--->",
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     "foo "\n'
        '|     <!---->\n'
        '|     " "\n'
        '|     <!---->\n',
    ),
    (
        "dialog-keeps-p-open",
        "<!doctype html><p>foo<dialog>bar<p>baz",
        '| <!doctype>\n'
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     <p>\n'
        '|       "foo"\n'
        '|     <dialog>\n'
        '|       "bar"\n'
        '|       <p>\n'
        '|         "baz"\n',
    ),
    (
        "dialog-end-closes-p",
        "<!doctype html><dialog><p>foo</dialog>bar",
        '| <!doctype>\n'
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     <dialog>\n'
        '|       <p>\n'
        '|         "foo"\n'
        '|     "bar"\n',
    ),
    (
        "keygen-closes-select",
        "<select><keygen>",
        '| <html>\n'
        '|   <head>\n'
        '|   <body>\n'
        '|     <select>\n'
        '|     <keygen>\n',
    ),
]


@pytest.mark.parametrize(
    "input_html,expected", [(c[1], c[2]) for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_browser_disagreement_pinned(input_html, expected):
    assert print_tree(parse(input_html)) == expected
