"""The fused single-walk pipeline (extract.analyze_tree) must be
semantically identical to the event-stream path (print_tree +
extract_from_events) on every golden fixture input."""

import json

import pytest

from htmlgraft import parse, print_tree
from htmlgraft.extract import analyze_tree, extract_main_text
from htmlgraft.walk import traverse


def _fixture_inputs():
    inputs = []
    with open("fixtures/trees.jsonl") as fh:
        for line in fh:
            rec = json.loads(line)
            if not rec.get("error"):
                inputs.append((rec["id"], rec["input"]))
    return inputs


FIXTURES = _fixture_inputs()


@pytest.mark.parametrize("fid,html", FIXTURES, ids=[f[0] for f in FIXTURES])
def test_fused_equals_event_path(fid, html):
    doc = parse(html)
    dom, text, n_nodes = analyze_tree(doc, include_dom=True)
    assert dom == print_tree(doc)
    assert text == extract_main_text(doc)
    assert n_nodes == sum(1 for ev in traverse(doc) if ev[0] == "START")


def test_fused_no_dom():
    doc = parse("<div><p>hello <b>world</b></p></div>")
    dom, text, _ = analyze_tree(doc, include_dom=False)
    assert dom == ""
    assert text == extract_main_text(doc)
