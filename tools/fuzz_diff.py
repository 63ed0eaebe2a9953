#!/usr/bin/env python
"""Seeded fuzz differential: generate random tag-soup documents, parse with
BOTH the reference (under Node) and htmlgraft, and require byte-identical
html5lib-format output + canonical trees — including throw parity (inputs
the reference throws on must raise here too).

Usage: python tools/fuzz_diff.py [n_cases] [seed]
Exits non-zero on the first divergence, printing the repro input.
"""

import json
import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAGS = (
    "div p span a b i u s em strong small nobr table tbody thead tfoot tr td"
    " th caption colgroup col ul ol li dl dt dd select option optgroup"
    " h1 h2 h3 form input img br hr pre code blockquote article section"
    " nav header footer aside main figure button label textarea title style"
    " script svg circle rect path foreignObject math mi mo mn annotation-xml"
    " font frameset frame noframes iframe body head html template video audio"
).split()

WORDS = "alpha beta gamma delta eps zeta eta theta lorem ipsum x y z".split()

ENTITIES = ["&amp;", "&lt;", "&gt;", "&quot;", "&#65;", "&#x41;", "&#x80;",
            "&notin;", "&bogus;", "&apos;", "&AMP", "&lt", "&#1114112;", "&#xD800;",
            "&#0;", "&#x0;", "&#999999999999999999;", "&#x10FFFF;", "&#x9f;"]


# foreign-content / integration-point nesting material (reference suites:
# test/scripts/samples.js "Integration points" ~:806 and the commented-out
# "Templates" suite ~:1053)
FOREIGN_ROOTS = ["svg", "math", "SVG", "Math"]
INTEGRATION_POINTS = [
    "desc", "title", "foreignObject", "foreignobject", "FOREIGNOBJECT",
    "mi", "mo", "mn", "ms", "mtext",
    "annotation-xml", 'annotation-xml encoding="text/html"',
    "annotation-xml encoding='application/xhtml+xml'",
    "annotation-xml encoding=TEXT/HTML", "annotation-xml encoding=other",
]
BREAKOUTS = [
    "div", "p", "ul", "li", "table", "tbody", "tr", "td", "caption",
    "colgroup", "select", "option", "optgroup", "button", "a", "b",
    "font", "font color=red", "font face=serif", "font size=3",
    "font x=y", "body", "head", "img", "image", "br", "template",
    "input type=hidden", "input type=text",
]
FOREIGN_LEAVES = ["foo", "bar", " ", "<selfClose/>", "<br/>", "<other/>",
                  "<circle>", "<mglyph>", "<malignmark>", "&amp;", "\x00"]


def gen_foreign_nest(rng: random.Random) -> str:
    """One svg/math integration-point nest: foreign roots, integration
    points, breakout html tags, abrupt </svg>/</math> closes — often left
    unclosed so EOF synthesis runs inside foreign context."""
    parts = [f"<{rng.choice(FOREIGN_ROOTS)}>"]
    closers = []
    for _ in range(rng.randint(1, 6)):
        r = rng.random()
        if r < 0.3:
            ip = rng.choice(INTEGRATION_POINTS)
            parts.append(f"<{ip}>")
            closers.append(ip.split(" ", 1)[0].split("=", 1)[0])
        elif r < 0.5:
            parts.append(f"<{rng.choice(BREAKOUTS)}>")
        elif r < 0.65:
            parts.append(f"<{rng.choice(FOREIGN_ROOTS)}>")
        elif r < 0.85:
            parts.append(rng.choice(FOREIGN_LEAVES))
        else:
            parts.append(rng.choice(
                ["</svg>", "</math>", "</SVG>"]
                + ([f"</{closers[-1]}>"] if closers else [])
            ))
    if rng.random() < 0.5:
        parts.append(rng.choice(["bee", "</svg>bee", "</math>bee", "<div>x"]))
    return "".join(parts)


def gen_template_eof(rng: random.Random) -> str:
    """<template> content interacting with EOF: tables/selects/formatting
    left open inside (or around) a template, sometimes cut mid-token."""
    inner = rng.choice([
        "<colgroup><td>cell1<td>cell2", "<tr><td>x", "<td>only-cell",
        "<caption>c<tr>", "<select><option>o1<option>o2", "<li>a<li>b",
        "<b><i>fmt", "<table><tr><td>deep", "<svg><desc>d",
        "<template><td>nested", "text-only", "<p>para", "",
    ])
    s = rng.choice([
        f"<template>{inner}",
        f"<template>{inner}</template>after",
        f"<table><template>{inner}",
        f"<table><tr><template>{inner}",
        f"<select><template>{inner}",
        f"<div><template>{inner}</template>",
        f"<template>{inner}</TEMPLATE>tail",
    ])
    if rng.random() < 0.25 and len(s) > 4:
        s = s[:rng.randrange(4, len(s))]  # hard EOF mid-structure/mid-token
    return s


def gen_doc(rng: random.Random) -> str:
    parts = []
    if rng.random() < 0.3:
        parts.append("<!doctype html>")
    n = rng.randint(3, 40)
    open_stack = []
    for _ in range(n):
        r = rng.random()
        if r < 0.06:
            parts.append(gen_foreign_nest(rng))
        elif r < 0.1:
            parts.append(gen_template_eof(rng))
        elif r < 0.35:
            tag = rng.choice(TAGS)
            if rng.random() < 0.2:  # case-variant names hit the lowercase path
                tag = tag.upper() if rng.random() < 0.5 else tag.capitalize()
            attrs = ""
            for _ in range(rng.randint(0, 2)):
                k = rng.choice(["id", "class", "href", "x", "data-a", "toString",
                                "ID", "Class", "x\x00y"])
                style = rng.random()
                v = rng.choice(WORDS + [
                    "&amp;x", "a&#65;b", "&#0;", "&#x0;", "&#999999999999999999;",
                    "a\nb", "a\rb", "</div>", "x=y", "a b", "&bogus", "q'q",
                ])
                if style < 0.33:
                    attrs += f' {k}="{v}"'
                elif style < 0.66:
                    attrs += f" {k}='{v}'"
                else:
                    attrs += f" {k}={v}"
            selfclose = "/" if rng.random() < 0.1 else ""
            parts.append(f"<{tag}{attrs}{selfclose}>")
            open_stack.append(tag)
        elif r < 0.55:
            if open_stack and rng.random() < 0.7:
                # close something (maybe out of order)
                idx = rng.randrange(len(open_stack))
                parts.append(f"</{open_stack.pop(idx)}>")
            else:
                parts.append(f"</{rng.choice(TAGS)}>")
        elif r < 0.8:
            words = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 6)))
            if rng.random() < 0.2:
                words += rng.choice(ENTITIES)
            if rng.random() < 0.1:
                words = "  " + words + "   "
            parts.append(words)
        elif r < 0.88:
            parts.append(rng.choice(["\n", "\r\n", "\r", "\t", "\x00",
                                     "<!-- c -->", "<!--->", "<?pi?>", "</>"]))
        elif r < 0.94:
            # rawtext/rcdata bodies with lookalike closers
            el = rng.choice(["script", "style", "textarea", "title", "xmp", "iframe"])
            body = rng.choice([
                "var x = '</div>';", "</scr", "<!-- </script> -->", "a </STYLE x",
                "&amp; &#65; text", "</%s" % el, "</%s x>done" % el, "a<b>c",
            ])
            close = rng.choice(["</%s>" % el, "</%s >" % el.upper(), ""])
            parts.append("<%s>%s%s" % (el, body, close))
        else:
            # pathological fragments, incl. whole-tag-fast-path adversaries:
            # spaces around '=', '/'-terminated unquoted values, leading-'/'
            # values, quotes inside unquoted values, values with '<' and '=',
            # no-space attr after a quoted value, proto-key attr names
            parts.append(rng.choice([
                "<", ">", "</", "<!", "<a", "=x", '"', "'", "<b/", "< p>",
                "<p x=", "<p x='unterminated", '<p x="q', "<--", "&#",
                "<a x = 1>", "<a x =1>", "<a x= 1>", "<img a=1/>",
                "<a href=/>", "<a href=/x/>", "<a x=/y z=1>", "<a x=y/ >",
                '<i a="1"b=2>', "<i a=a\"b>", "<i a='>x", "<a x=a<b>",
                "<a x==y>", "<a constructor=1 x=2>", "<a x=`t`>",
                "<br />", "<br / >", "<b x/>", '<a x="1"/>', "<a x=1 x=2>",
                "<a x\ty=2>", "<a x=1\fz=2>", "<a 2x=3>", "<a x:y.z-w_v=1>",
                "<a x=&amp;>", "<a x='&'>", "<a x=\r\nb>",
            ]))
    return "".join(parts)


import re as _re

_CUT_TARGET_RE = _re.compile(
    r"&|<!--|-->|--!>|</?(?:svg|math|foreignObject|annotation-xml|mi|mo|"
    r"desc|title|template)",
    _re.IGNORECASE,
)


def gen_cuts(rng: random.Random, s: str, max_cuts: int = 24) -> list[int]:
    """Chunked-write split points aimed at the tokeniser's resumability
    seam (reference tokeniser.js:68-71: pos/anchor persist across write
    calls on a growing buffer): cuts INSIDE character references, INSIDE
    comment open/close punctuation, and MID-NAME of foreign-content /
    integration-point tags — the places where the longest-match restart
    has to reconstruct a partially-seen token — plus a few uniform cuts."""
    cuts = set()
    for m in _CUT_TARGET_RE.finditer(s):
        a, b = m.start(), m.end()
        for d in (1, 2, 3):
            if a + d < len(s):
                cuts.add(a + d)
        cuts.add(min(b + 1, len(s) - 1))
    for _ in range(3):
        if len(s) > 2:
            cuts.add(rng.randrange(1, len(s)))
    out = sorted(c for c in cuts if 0 < c < len(s))
    if len(out) > max_cuts:
        out = sorted(rng.sample(out, max_cuts))
    return out


NODE_SCRIPT = r"""
import { readFileSync, writeFileSync } from "fs";
import { parse, Tokeniser, Parser } from "/root/reference/lib/index.js";
import { printTree } from "/root/reference/lib/traversal.js";
import { Document, Element, Comment, Doctype } from "/root/reference/lib/dom.js";
const decode = new TextDecoder();
const helper = readFileSync("/root/repo/tools/gen_fixtures.mjs","utf8");
const fns = helper.match(/function treeJson[\s\S]*?\n}\n\nfunction childrenJson[\s\S]*?\n}/);
const [treeJson] = eval("(() => { " + fns[0] + "; return [treeJson]; })()");
const inp = readFileSync(process.argv[2], "utf8").split("\n").filter(x=>x).map(l=>JSON.parse(l));
const out = inp.map(rec => {
  try {
    let d;
    if (rec.cuts) {
      // streaming path: growing-buffer writes with the given split
      // points, then the same double-end as parse() + index.js
      const p = new Parser();
      const t = new Tokeniser(p);
      for (const c of rec.cuts) t.write(rec.s.slice(0, c));
      t.write(rec.s);
      t.end();
      t.end();
      d = p.document;
    } else {
      d = parse(rec.s);
    }
    return { id: rec.id, dom: printTree(d), tree: treeJson(d) };
  } catch (e) {
    return { id: rec.id, error: true };
  }
});
writeFileSync(process.argv[3], out.map(o=>JSON.stringify(o)).join("\n"));
"""


def _chunked_parse(s: str, cuts: list[int]):
    """htmlgraft streaming parse mirroring the Node side: growing-buffer
    writes at the same split points, then the parse()-equivalent double
    end (write+end inside parse, plus the index.js second end)."""
    from htmlgraft import Parser, Tokeniser

    p = Parser()
    t = Tokeniser(p)
    for c in cuts:
        t.write(s[:c])
    t.write(s)
    t.end_input()
    t.end_input()
    return p.document


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    chunked = "--chunked" in sys.argv[3:]
    rng = random.Random(seed)
    cases = [gen_doc(rng) for _ in range(n)]
    cuts = [gen_cuts(rng, s) for s in cases] if chunked else None

    with tempfile.TemporaryDirectory() as td:
        inp, outp, script = (os.path.join(td, x) for x in ("in.jsonl", "out.jsonl", "ref.mjs"))
        with open(inp, "w") as fh:
            for i, s in enumerate(cases):
                rec = {"id": i, "s": s}
                if chunked:
                    rec["cuts"] = cuts[i]
                fh.write(json.dumps(rec) + "\n")
        with open(script, "w") as fh:
            fh.write(NODE_SCRIPT)
        subprocess.run(["node", script, inp, outp], check=True)
        ref = {}
        with open(outp) as fh:
            for line in fh:
                rec = json.loads(line)
                ref[rec["id"]] = rec

    from htmlgraft import parse as gparse, print_tree, tree_to_jsonable

    n_err = 0
    for i, s in enumerate(cases):
        want = ref[i]
        try:
            doc = _chunked_parse(s, cuts[i]) if chunked else gparse(s)
            got = {"dom": print_tree(doc), "tree": tree_to_jsonable(doc)}
            ok_err = False
        except Exception:
            got = None
            ok_err = True
        if want.get("error"):
            n_err += 1
            if not ok_err:
                print(f"DIVERGENCE case {i}: reference throws, htmlgraft parses")
                print(repr(s))
                sys.exit(1)
            continue
        if ok_err:
            print(f"DIVERGENCE case {i}: htmlgraft throws, reference parses")
            print(repr(s))
            sys.exit(1)
        if got["dom"] != want["dom"] or json.dumps(
            got["tree"], sort_keys=True
        ) != json.dumps(want["tree"], sort_keys=True):
            print(f"DIVERGENCE case {i}:")
            print(repr(s))
            print("--- reference dom ---"); print(want["dom"])
            print("--- htmlgraft dom ---"); print(got["dom"])
            sys.exit(1)
    mode = "chunked-write " if chunked else ""
    print(f"fuzz diff OK: {n} {mode}cases byte-identical (seed={seed}, "
          f"{n_err} throw-parity cases)")


if __name__ == "__main__":
    main()
