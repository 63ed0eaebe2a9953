"""Pinned parity for the reference's fragment-parsing entry point.

The reference exports ``TreeBuilder`` and routes exactly ONE element kind
through its (explicitly TODO) ``fragmentRule``: ``template``
(/root/reference/lib/schema.js:401 and :838).  fragmentRule is
``{ closableAncestors: None, namespace: html, content: Any }`` — i.e.
template content accepts ANY child and nothing outside it can auto-close
through it.  That is NOT what WHATWG prescribes ("in template" insertion
mode with template-insertion-mode stack), and the quirks below are the
observable difference.  htmlgraft mirrors the rule verbatim
(htmlgraft/_tables.py 'template': (59, 'fragmentRule'); grammar.py
FRAGMENT_RULE), and this module pins the behavior as COMMITTED LITERALS
(hand transcribed from the reference under Node on 2026-08-19) so a
future "fix toward WHATWG" fails here with an explanation instead of
silently breaking byte-identity.

Quirks these cases pin:
  * ``<td>``/``<tr>`` accepted DIRECTLY inside a head-level template
    (content: Any — no foster parenting, no table-context synthesis),
    and the document then grows the double-``<body>`` artifact the
    reference emits after a head-level template.
  * ``</template>`` does not close the template when inner elements are
    still open with content:Any (case 3: the trailing "c" lands inside
    the template's second <p>, coalescing to "bc").
  * ``</div>`` before any content in a template is ignored, and a
    stray ``<body>`` materializes INSIDE the template (case 6).
  * closableAncestors: None — an outer <table> cannot close through a
    template boundary (case 2 keeps <td> inside the template).
"""

import pytest

from htmlgraft import parse, print_tree

CASES = [
    (
        "td-in-head-template",
        "<template><td>x",
        '| <html>\n|   <head>\n|     <template>\n|       <td>\n'
        '|         "x"\n|   <body>\n|   <body>\n',
    ),
    (
        "table-template-boundary",
        "<table><template><td>x</template></table>",
        '| <html>\n|   <head>\n|   <body>\n|     <table>\n'
        '|       <template>\n|         <td>\n|           "x"\n',
    ),
    (
        "end-template-does-not-close",
        "<template><p>a<p>b</template>c",
        '| <html>\n|   <head>\n|     <template>\n|       <p>\n'
        '|         "a"\n|       <p>\n|         "bc"\n|   <body>\n'
        '|   <body>\n',
    ),
    (
        "tr-td-in-template",
        "<template><tr><td>1<td>2",
        '| <html>\n|   <head>\n|     <template>\n|       <tr>\n'
        '|         <td>\n|           "1"\n|         <td>\n'
        '|           "2"\n|   <body>\n|   <body>\n',
    ),
    (
        "body-level-template",
        "<div><template><div>y",
        '| <html>\n|   <head>\n|   <body>\n|     <div>\n'
        '|       <template>\n|         <div>\n|           "y"\n',
    ),
    (
        "stray-endtag-body-inside-template",
        "<template></div>text",
        '| <html>\n|   <head>\n|     <template>\n|       "text"\n'
        '|       <body>\n',
    ),
]


@pytest.mark.parametrize(
    "input_html,expected", [(c[1], c[2]) for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_template_fragment_rule_pinned(input_html, expected):
    assert print_tree(parse(input_html)) == expected
