"""Semantic pins for the round-3 session-6 corpus operators:
line_scrub (C4-style duplicated-line removal), layout_cluster (DOM template
skeleton clustering), inverted_index (IR posting-list build).

The value-level oracle agreement is covered by tests/test_entry.py; these
tests pin the SEMANTICS with pure-Python recomputes so a synthesis or
threshold drift cannot silently turn an operator into a no-op while both
SQL dialects still agree."""

import hashlib
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from htmlgraft.corpus import pages_df
from htmlgraft.job import parse_extract


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return entrymod.queries()[name](spark, sf_dir).toPandas()

    return run


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_line_scrub_full_recompute(q, spark, sf_dir):
    texts = (
        parse_extract(pages_df(spark, sf_dir))
        .select("url", "text")
        .toPandas()
        .set_index("url")["text"]
    )
    counts = Counter(
        line for text in texts for line in text.split("\n")
    )
    got = q("line_scrub").set_index("url")
    assert set(got.index) == set(texts.index)
    saw_scrubbed = saw_clean = False
    for url, text in texts.items():
        lines = text.split("\n")
        kept = [ln for ln in lines if counts[ln] <= 2]
        row = got.loc[url]
        assert row.n_kept == len(kept), url
        assert row.n_dropped == len(lines) - len(kept), url
        assert row.scrub_md5 == _md5("\n".join(kept)), url
        if not kept:
            saw_scrubbed = True  # repetitious doc fully scrubbed
        if len(kept) == len(lines):
            saw_clean = True  # unique doc passes through untouched
    # both outcomes must occur naturally or the operator pins nothing
    assert saw_scrubbed and saw_clean


_SKEL_RE = re.compile(r"^\| *<([a-zA-Z][a-zA-Z0-9-]*)>$", re.M)


def test_layout_cluster_full_recompute(q, spark, sf_dir):
    doms = (
        parse_extract(pages_df(spark, sf_dir), include_dom=True)
        .select("url", "dom")
        .toPandas()
    )
    clusters = defaultdict(list)
    for url, dom in zip(doms.url, doms.dom):
        tags = _SKEL_RE.findall(dom)
        # structural facts the skeleton must carry: tbody is SYNTHESIZED
        # (never in the source), the svg subtree survives foreign content
        assert "tbody" in tags, url
        assert "svg" in tags, url
        clusters[_md5(" ".join(tags))].append(url)
    got = q("layout_cluster").set_index("skeleton_md5")
    assert set(got.index) == set(clusters)
    for skel, urls in clusters.items():
        assert got.loc[skel].n_pages == len(urls)
        assert got.loc[skel].exemplar_url == min(urls)
    # template detection is only useful if pages actually collapse
    assert len(clusters) < len(doms) / 10


def test_inverted_index_full_recompute(q, spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "text"]
    ]
    postings = defaultdict(list)
    for doc_id, text in zip(docs.doc_id, docs.text):
        for tok in text.split(" "):
            if tok:
                postings[tok].append(int(doc_id))
    got = q("inverted_index").set_index("tok")
    assert set(got.index) == set(postings)
    for tok, ids in postings.items():
        row = got.loc[tok]
        assert row.n_total == len(ids), tok
        assert row.n_docs == len(set(ids)), tok
        want = _md5(",".join(str(x) for x in sorted(set(ids))))
        assert row.postings_md5 == want, tok
    # posting lists must have real multiplicity (n_total > n_docs somewhere)
    assert (got.n_total > got.n_docs).any()
