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
