"""Fuzz differential regression: the minimal double-end repro, plus a small
seeded fuzz batch live-diffed against the reference under Node (skipped if
node is unavailable)."""

import shutil
import subprocess
import sys

import pytest

from htmlgraft import parse, print_tree


def test_template_eof_double_body():
    # index.js parse() ends the tokeniser twice; EOF inside <template>
    # therefore synthesizes TWO bare sibling <body> nodes (reference quirk,
    # found by fuzzing — see htmlgraft.parse.parse docstring)
    dom = print_tree(parse("</><template><o>"))
    assert dom.count("| <!---->\n") == 1
    assert dom.count("|   <body>\n") == 2


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_fuzz_differential_small():
    out = subprocess.run(
        [sys.executable, "tools/fuzz_diff.py", "150", "4242"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout[-3000:]
    assert "byte-identical" in out.stdout


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_fuzz_differential_chunked_writes():
    """Streaming parity: the SAME split points (inside char-refs, comment
    punctuation, and foreign-content tag names — the tokeniser's
    resumability seam) driven through both implementations' write()/end()
    must stay byte-identical, including throw parity."""
    out = subprocess.run(
        [sys.executable, "tools/fuzz_diff.py", "120", "4242", "--chunked"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout[-3000:]
    assert "chunked-write cases byte-identical" in out.stdout


def test_chunked_cuts_target_the_seams():
    """gen_cuts must actually place cuts inside char-refs and comments."""
    import random

    sys.path.insert(0, "tools")
    from fuzz_diff import gen_cuts

    s = "<div>a&amp;b<!-- c --><svg><desc>t</desc></svg>&#x41;</div>"
    cuts = gen_cuts(random.Random(1), s)
    amp = s.index("&amp;")
    assert any(amp < c < amp + 5 for c in cuts)          # inside &amp;
    cm = s.index("<!--")
    assert any(cm < c < cm + 4 for c in cuts)            # inside <!--
    sv = s.index("<svg")
    assert any(sv < c < sv + 4 for c in cuts)            # mid foreign tag
