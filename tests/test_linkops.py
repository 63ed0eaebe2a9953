"""Link/metadata extraction tests: reference-tree anchoring (the link walk
over OUR parse must equal the same walk over the REFERENCE parser's tree),
corpus link-skeleton invariants, host resolution, integer-PageRank
properties, and the parse-error path."""

import json
import pathlib

import pandas as pd
import pytest

from htmlgraft import parse
from htmlgraft.extract import DATA, END, START, events_from_json
from htmlgraft.linkops import (
    BASE,
    ITERS,
    SCALE,
    _links_batch,
    _meta_batch,
    analyze_links,
)
from htmlgraft.walk import DOCTYPE

FIX = pathlib.Path(__file__).resolve().parent.parent / "fixtures"


def _load(name):
    with open(FIX / name, encoding="utf-8") as f:
        return [json.loads(x) for x in f if x.strip()]


PAGES = {p["url"]: p["html"] for p in _load("pages_sample.jsonl")}
TREES = _load("pages_trees.jsonl")
ADV_PAGES = {p["url"]: p["html"] for p in _load("pages_adversarial.jsonl")}
ADV_TREES = _load("pages_adversarial_trees.jsonl")


def links_meta_from_events(events):
    """The analyze_links semantics re-derived over an event stream (used to
    anchor the DOM walk against reference-parsed trees)."""
    import re

    ws = re.compile(r"[\t\n\r\f ]+")
    links, collecting = [], []  # collecting: [kind, href, parts, depth]
    title = h1 = None
    title_done = h1_done = False
    has_doctype = 0
    depth = 0
    for ev in events:
        k = ev[0]
        if k == START:
            depth += 1
            name = ev[1]
            attrs = dict(ev[2]) if len(ev) > 2 and ev[2] else {}
            if name == "a" and "href" in attrs:
                collecting.append(["a", attrs["href"], [], depth])
            elif name == "title" and not title_done:
                collecting.append(["title", None, [], depth])
            elif name == "h1" and not h1_done:
                collecting.append(["h1", None, [], depth])
        elif k == END:
            for c in list(collecting):
                if c[3] == depth:
                    text = ws.sub(" ", "".join(c[2])).strip()
                    if c[0] == "a":
                        links.append((c[1], text))
                    elif c[0] == "title" and not title_done:
                        title, title_done = text, True
                    elif c[0] == "h1" and not h1_done:
                        h1, h1_done = text, True
                    collecting.remove(c)
            depth -= 1
        elif k == DATA:
            for c in collecting:
                c[2].append(ev[1])
        elif k == DOCTYPE:
            has_doctype = 1
    return links, title, h1, has_doctype


@pytest.mark.parametrize("fx", TREES, ids=[t["id"] for t in TREES])
def test_links_match_reference_tree(fx):
    doc = parse(PAGES[fx["id"]])
    ours = analyze_links(doc)
    ref = links_meta_from_events(events_from_json(fx["tree"]))
    assert ours[0] == ref[0]  # links (href, anchor) in document order
    assert ours[1] == ref[1]  # title
    assert ours[2] == ref[2]  # h1
    # has_doctype: analyze_links checks Document children; fixture trees in
    # JSON form carry no doctype events at corpus sampling, so compare via
    # the page text instead
    assert ours[3] == (1 if "<!DOCTYPE" in PAGES[fx["id"]] else 0)


@pytest.mark.parametrize("fx", ADV_TREES, ids=[t["id"] for t in ADV_TREES])
def test_links_match_reference_tree_adversarial(fx):
    doc = parse(ADV_PAGES[fx["id"]])
    ours = analyze_links(doc)
    ref = links_meta_from_events(events_from_json(fx["tree"]))
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]


@pytest.mark.parametrize("fx", TREES[:12], ids=[t["id"] for t in TREES[:12]])
def test_corpus_link_skeleton(fx):
    """The synthesized corpus emits exactly the 8-link skeleton the DuckDB
    oracle states relationally (htmlgraft/corpus.py _html_expr)."""
    url = fx["id"]
    doc_id = int(url.rsplit("/", 1)[1])
    source = url.rsplit("/", 2)[1]
    host = url.split("/")[2]
    links, title, h1, has_doctype = analyze_links(parse(PAGES[url]))
    assert [l[0] for l in links[:7]] == [
        "/", f"/{source}", "/about?a=1&b=2", "/more", "/r1", "/r2", "/tos"
    ]
    assert links[1][1] == source
    assert links[7][0].startswith("https://") and links[7][0].endswith("/")
    assert links[7][1] == "partner"
    assert title == f"Doc {doc_id} — {source}"
    assert h1 == host
    assert has_doctype == (0 if doc_id % 7 == 0 else 1)
    # cross-host partner target matches the corpus PARTNER_EXPR
    want = (
        "popular.example.com" if doc_id % 13 == 0
        else f"site-{(doc_id * 7 + 3) % 211}.example.org"
    )
    assert links[7][0] == f"https://{want}/"


def test_nested_and_fostered_links():
    # links inside table cells, formatting reconstruction, and unquoted hrefs
    html = (
        "<body><table><tr><td><a href=/cell><b>bold</b> cell link</a>"
        "<table><a href=/fostered>foster</a><tr><td>x</table></body>"
    )
    links, _, _, _ = analyze_links(parse(html))
    hrefs = [h for h, _ in links]
    assert "/cell" in hrefs and "/fostered" in hrefs
    anchor = dict(links)["/cell"]
    assert anchor == "bold cell link"


def test_link_without_href_is_skipped():
    links, _, _, _ = analyze_links(parse("<body><a name=x>anchor</a>"))
    assert links == []


def test_first_title_and_h1_win():
    links, title, h1, _ = analyze_links(
        parse("<body><h1>first</h1><h1>second</h1></body>")
    )
    assert h1 == "first"


def _batch_out(fn, rows):
    pdf = pd.DataFrame(rows)
    return pd.concat(list(fn(iter([pdf]))), ignore_index=True)


def test_links_batch_error_doc_emits_no_rows():
    # <constructor> triggers the reference's JS prototype-key throw; the
    # batch must skip the document, not fail the task
    rows = {
        "url": ["u1", "u2"],
        "html": [b"<body><a href=/x>ok</a>", b"<constructor>"],
    }
    out = _batch_out(_links_batch, rows)
    assert out["url"].tolist() == ["u1"]
    assert out["href"].tolist() == ["/x"]
    meta = _batch_out(_meta_batch, rows)
    assert meta["url"].tolist() == ["u1"]
    assert meta["n_links"].tolist() == [1]


# --- structured table extraction ---------------------------------------------

def test_corpus_meta_table_grid():
    """The synthesized meta table (implicit closes throughout) must come
    back as the exact 3x2 grid the oracle states relationally."""
    from htmlgraft.linkops import analyze_tables

    url = next(iter(PAGES))
    doc_id = int(url.rsplit("/", 1)[1])
    cells = analyze_tables(parse(PAGES[url]))
    assert [(t, r, c, h) for t, r, c, h, _ in cells] == [
        (1, 1, 1, 1), (1, 1, 2, 0),
        (1, 2, 1, 1), (1, 2, 2, 0),
        (1, 3, 1, 1), (1, 3, 2, 0),
    ]
    texts = [x[4] for x in cells]
    assert texts[0] == "id" and texts[1] == str(doc_id)
    assert texts[2] == "lang" and texts[4] == "link"
    assert texts[5] == "more like this"


def test_tables_implicit_closes_and_nesting():
    from htmlgraft.linkops import analyze_tables

    # th closed by td, tr by tr, tbody synthesized; a table nested in a
    # cell is flattened into the cell text, not emitted separately
    html = (
        "<body><table><tr><th>a<td>b<tr><td>"
        "<table><tr><td>inner</table> outer</table>"
    )
    cells = analyze_tables(parse(html))
    assert [(t, r, c, h, x) for t, r, c, h, x in cells] == [
        (1, 1, 1, 1, "a"),
        (1, 1, 2, 0, "b"),
        (1, 2, 1, 0, "inner outer"),
    ]


def test_tables_fostered_text_not_in_cells():
    from htmlgraft.linkops import analyze_tables

    # text directly inside <table> is foster-parented BEFORE the table by
    # the reference parser, so it must not appear in any cell
    cells = analyze_tables(parse("<body><table>stray<tr><td>x</table>"))
    assert [x[4] for x in cells] == ["x"]


def test_tables_batch_error_doc_emits_no_rows():
    from htmlgraft.linkops import _tables_batch

    rows = {
        "url": ["u1", "u2"],
        "html": [b"<table><tr><td>ok</table>", b"<constructor>"],
    }
    out = _batch_out(_tables_batch, rows)
    assert out["url"].tolist() == ["u1"]
    assert out["cell_text"].tolist() == ["ok"]


def test_pagerank_constants_are_integer_consistent():
    # base + damp must reconstruct SCALE under integer arithmetic
    assert BASE == 150_000_000_000 and SCALE == 10**12 and ITERS >= 3


def test_pagerank_oracle_properties():
    """Run the DuckDB oracle at sf0.001 and pin PageRank sanity: every rank
    >= BASE, the heavy host (in-degree skew target) ranks highest, and
    total mass stays below n * SCALE (dangling/rounding only lose mass)."""
    import duckdb

    from htmlgraft.linkops import pagerank_oracle_sql

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    df = con.execute(pagerank_oracle_sql()).df()
    assert len(df) >= 200  # all 211 site hosts + the popular host
    assert (df["rank"] >= BASE).all()
    top = df.sort_values("rank", ascending=False).iloc[0]
    assert top["host"] == "popular.example.com"
    assert df["rank"].sum() <= len(df) * SCALE


def test_host_components_full_recompute(spark, sf_dir):
    """Pin host_components against an independent pure-Python BFS over the
    oracle-free hostgraph recompute: the true components (not a round-
    limited approximation), so the test also proves HC_ITERS rounds reach
    the fixpoint on this corpus."""
    from collections import defaultdict

    import __spark_entry__ as entrymod
    from htmlgraft.linkops import HC_MIN_WEIGHT

    qs = entrymod.queries()
    hg = qs["link_hostgraph"](spark, sf_dir).toPandas()
    adj = defaultdict(set)
    hosts = sorted(set(hg.src_host) | set(hg.dst_host))
    strong = hg[(hg.src_host != hg.dst_host) & (hg.n_links >= HC_MIN_WEIGHT)]
    for s, d in zip(strong.src_host, strong.dst_host):
        adj[s].add(d)
        adj[d].add(s)
    want = {}
    for h in hosts:
        if h in want:
            continue
        comp, q = set(), [h]
        while q:
            c = q.pop()
            if c in comp:
                continue
            comp.add(c)
            q.extend(adj[c] - comp)
        rep = min(comp)
        for c in comp:
            want[c] = (rep, len(comp))

    got = qs["host_components"](spark, sf_dir).toPandas()
    assert len(got) == len(hosts)
    for row in got.itertuples():
        assert (row.cluster_rep, row.cluster_size) == want[row.host], row.host
    # the thresholded graph is non-trivial: real multi-host families exist
    # AND the partner-footer giant component is gone
    assert got.cluster_size.max() > 3
    assert got.cluster_rep.nunique() > 10


def test_absolute_href_spellings_resolve_to_own_authority(spark):
    """http://, https://, and protocol-relative //host hrefs all carry
    their own authority; everything else resolves to the page host.  Real
    crawls emit all three absolute spellings — hostgraph and frontier must
    agree on them (they once diverged: https-only vs ^https?://)."""
    from htmlgraft.linkops import frontier_df, hostgraph_df

    links = spark.createDataFrame(
        [
            ("https://src.example.org/a/1", 1, "https://h1.example.com/x", "a"),
            ("https://src.example.org/a/1", 2, "http://h2.example.com/y", "b"),
            ("https://src.example.org/a/1", 3, "//h3.example.com/z", "c"),
            ("https://src.example.org/a/1", 4, "/relative", "d"),
        ],
        "url string, pos int, href string, anchor string",
    )
    hg = {
        (r["src_host"], r["dst_host"])
        for r in hostgraph_df(links).collect()
    }
    assert hg == {
        ("src.example.org", "h1.example.com"),
        ("src.example.org", "h2.example.com"),
        ("src.example.org", "h3.example.com"),
        ("src.example.org", "src.example.org"),
    }

    crawled = spark.createDataFrame([("https://none/",)], "url string")
    fr = {r["frontier_url"] for r in frontier_df(links, crawled).collect()}
    assert fr == {
        "https://h1.example.com/x",
        "http://h2.example.com/y",
        "https://h3.example.com/z",
        "https://src.example.org/relative",
    }


# --- WAT export: JSON escaping and record framing ------------------------------

def test_wat_payload_is_valid_json_under_adversarial_strings(spark):
    """The dual-dialect JSON template must emit parseable JSON with the
    exact structure, even when titles/hrefs/anchors carry quotes and
    backslashes (the synthetic corpus never does, so the md5 gate alone
    would not exercise the escape)."""
    import json

    from htmlgraft import linkops

    title = 'Ti"tle with \\ backslash'
    rows = [
        ("http://x/1", title, 1, 'http://a/?q="v"', 'anc"hor'),
        ("http://x/1", title, 2, "/pl\\ain", "text \\ two"),
    ]
    spark.createDataFrame(
        rows, "url string, title string, pos long, href string, anchor string"
    ).createOrReplaceTempView("__wat_esc")
    out = spark.sql(
        linkops.wat_payloads_cte("__wat_esc")
        + " select url, n_links, payload from payloads"
    ).collect()
    assert len(out) == 1 and out[0]["n_links"] == 2
    env = json.loads(out[0]["payload"])["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "http://x/1"
    meta = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert meta["Head"]["Title"] == title
    assert meta["Links"] == [
        {"pos": 1, "url": 'http://a/?q="v"', "text": 'anc"hor'},
        {"pos": 2, "url": "/pl\\ain", "text": "text \\ two"},
    ]


def test_wat_record_header_math(spark):
    """Content-Length in the WARC record header equals the payload length
    the oracle computes (char-length on both sides, same as wet_export)."""
    from htmlgraft import linkops

    spark.createDataFrame(
        [("http://x/1", "t — café", 1, "/a", "A")],
        "url string, title string, pos long, href string, anchor string",
    ).createOrReplaceTempView("__wat_one")
    row = spark.sql(
        linkops.wat_payloads_cte("__wat_one")
        + " select payload, "
        + linkops._wat_record(False, "url", "payload")
        + " as rec from payloads"
    ).collect()[0]
    rec, payload = row["rec"], row["payload"]
    head, _, rest = rec.partition("\r\n\r\n")
    assert f"Content-Length: {len(payload)}" in head
    assert rest == payload + "\r\n\r\n"
    assert head.startswith("WARC/1.0\r\nWARC-Type: metadata\r\n")


def test_hits_pure_python_recompute(spark, sf_dir):
    """Independent HITS recompute: rebuild the distinct cross-host edge
    set from the gated links relation, run the same 3 unnormalized
    power-iteration rounds in pure Python, and require exact integer
    agreement; the skewed in-degree host must carry the top authority."""
    from collections import defaultdict

    from htmlgraft.linkops import (
        HITS_ITERS, hits_df, links_df, pages_df,
    )

    links = links_df(pages_df(spark, sf_dir)).toPandas()
    edges = set()
    for r in links.itertuples():
        src = r.url.split("/")[2]
        dst = (r.href.split("/")[2]
               if r.href.startswith(("https://", "http://", "//"))
               else src)
        if src != dst:
            edges.add((src, dst))
    nodes = {h for e in edges for h in e}
    hub = {h: 1 for h in nodes}
    auth = {}
    for _ in range(HITS_ITERS):
        auth = defaultdict(int)
        for s, d in edges:
            auth[d] += hub[s]
        auth = {h: auth.get(h, 0) for h in nodes}
        nh = defaultdict(int)
        for s, d in edges:
            nh[s] += auth[d]
        hub = {h: nh.get(h, 0) for h in nodes}
    got = {r.host: (r.hub, r.auth)
           for r in hits_df(
               links_df(pages_df(spark, sf_dir))
           ).toPandas().itertuples()}
    assert got == {h: (hub[h], auth[h]) for h in nodes}
    top_auth = max(got, key=lambda h: got[h][1])
    assert top_auth == "popular.example.com"


def test_host_triangles_pure_python_recompute(spark, sf_dir):
    """Triangle counts and clustering pinned by a brute-force Python
    recompute over the same undirected host edges, and the K4/path
    corners pinned on a constructed graph (complete K4: every host in 3
    triangles, clustering 100; a path: zero triangles)."""
    import itertools

    import duckdb
    import pandas as pd

    from htmlgraft import linkops

    rows = linkops.run_host_triangles(spark, sf_dir).collect()
    from htmlgraft.corpus import pages_df
    from htmlgraft.linkops import hostgraph_df, links_df

    edges = hostgraph_df(links_df(pages_df(spark, sf_dir))).collect()
    und = {
        tuple(sorted((e["src_host"], e["dst_host"])))
        for e in edges if e["src_host"] != e["dst_host"]
    }
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {h: 0 for h in adj}
    n_total = 0
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c exactly once
                if a < b:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
                    n_total += 1
    got = {r["host"]: (r["degree"], r["n_triangles"], r["clustering_pct"])
           for r in rows}
    assert set(got) == set(adj)
    assert sum(r["n_triangles"] for r in rows) == 3 * n_total
    for h in adj:
        d = len(adj[h])
        want_pct = (200 * tri[h]) // (d * (d - 1)) if d >= 2 else 0
        assert got[h] == (d, tri[h], want_pct), h

    # constructed corners: K4 plus a pendant path
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("d", "e"), ("e", "f")]
    df = pd.DataFrame(
        [{"src_host": s, "dst_host": t} for s, t in k4]
        + [{"src_host": t, "dst_host": s} for s, t in k4]  # both directions
    )
    spark.createDataFrame(df).createOrReplaceTempView("hedges")
    g = {
        r["host"]: (r["degree"], r["n_triangles"], r["clustering_pct"])
        for r in spark.sql(
            "with " + linkops.triangles_sql(duck=False)
        ).collect()
    }
    con = duckdb.connect()
    con.register("hedges", df)
    w = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            "with " + linkops.triangles_sql(duck=True)
        ).fetchall()
    }
    assert g == w
    assert g["a"] == (3, 3, 100) and g["b"] == (3, 3, 100)
    assert g["d"] == (4, 3, 50)   # K4 corner with the pendant edge
    assert g["e"] == (2, 0, 0) and g["f"] == (1, 0, 0)


def test_host_cocitation_pure_python_recompute(spark, sf_dir):
    """Co-citation pinned by full Python recompute including the
    per-destination fan-in cap (strongest FANIN_CAP sources by link
    count desc, name asc); the popular destination must actually exceed
    the cap so the skew guard is exercised, and at least one capped-out
    source must lose its pairs through that hub."""
    from collections import defaultdict

    from htmlgraft import linkops
    from htmlgraft.corpus import pages_df
    from htmlgraft.linkops import hostgraph_df, links_df

    rows = linkops.run_host_cocitation(spark, sf_dir).collect()
    edges = hostgraph_df(links_df(pages_df(spark, sf_dir))).collect()
    ue = [(e["src_host"], e["dst_host"], e["n_links"]) for e in edges
          if e["src_host"] != e["dst_host"]]

    by_dst = defaultdict(list)
    outdeg = defaultdict(set)
    for s, d, n in ue:
        by_dst[d].append((s, n))
        outdeg[s].add(d)
    capped = {
        d: [s for s, _ in sorted(lst, key=lambda x: (-x[1], x[0]))
            [:linkops.FANIN_CAP]]
        for d, lst in by_dst.items()
    }
    assert any(len(lst) > linkops.FANIN_CAP for lst in by_dst.values()), (
        "corpus must exercise the fan-in cap"
    )
    shared = defaultdict(int)
    for d, srcs in capped.items():
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                shared[(a, b)] += 1
    want = {
        (a, b): (n, len(outdeg[a]), len(outdeg[b]),
                 (1000 * n) // min(len(outdeg[a]), len(outdeg[b])))
        for (a, b), n in shared.items()
    }
    got = {
        (r["host_a"], r["host_b"]): (r["n_shared"], r["deg_a"], r["deg_b"],
                                     r["cocite_milli"])
        for r in rows
    }
    assert got == want
    # a capped-out source loses pairs through the hub: exists some dst
    # where the full source list is strictly larger than the kept list
    hub = max(by_dst, key=lambda d: len(by_dst[d]))
    dropped = {s for s, _ in by_dst[hub]} - set(capped[hub])
    assert dropped


def test_host_hyperball_full_recompute(spark, sf_dir):
    """Full Python recompute of the HyperBall output from the hedges
    relation: registers (md5-based h32, rho over the 28-bit suffix),
    two rounds of register-wise max propagation along edges, the
    fixed-point raw estimates, and the exact radius-2 out-balls by BFS.
    Also pins corpus liveness: propagation must actually move registers
    (some host's radius-1 estimate differs from radius 0) and radius 2
    must reach past radius 1 for at least one host."""
    import hashlib

    import __spark_entry__ as entrymod
    from htmlgraft import linkops as L

    qs = entrymod.queries()
    hg = qs["link_hostgraph"](spark, sf_dir).toPandas()
    got = qs["host_hyperball"](spark, sf_dir).toPandas()

    edges = {
        (s, d)
        for s, d in zip(hg.src_host, hg.dst_host)
        if s != d
    }
    hosts = sorted({h for e in edges for h in e})
    out = {h: set() for h in hosts}
    for s, d in edges:
        out[s].add(d)

    M = L.HB_M

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def sketch_self(h: str) -> dict:
        hv = h32(h)
        suffix = hv // M
        rho = 29 if suffix == 0 else 29 - suffix.bit_length()
        return {hv % M: rho}

    regs = {h: sketch_self(h) for h in hosts}
    per_radius = [dict((h, dict(r)) for h, r in regs.items())]
    for _ in range(L.HB_ROUNDS):
        nxt = {}
        for h in hosts:
            merged = dict(regs[h])
            for n in out[h]:
                for b, r in regs[n].items():
                    if merged.get(b, 0) < r:
                        merged[b] = r
            nxt[h] = merged
        regs = nxt
        per_radius.append(dict((h, dict(r)) for h, r in regs.items()))

    def est(sk: dict) -> int:
        den = sum(1 << (32 - r) for r in sk.values())
        den += (M - len(sk)) * (1 << 32)
        return L.HB_ALPHA_NUM // den

    # exact radius-2 balls by BFS
    exact = {}
    for h in hosts:
        ball = {h}
        frontier = {h}
        for _ in range(L.HB_ROUNDS):
            frontier = {n for f in frontier for n in out[f]} - ball
            ball |= frontier
        exact[h] = len(ball)

    assert list(got.host) == hosts
    for _, row in got.iterrows():
        h = row.host
        assert row.n_exact_r2 == exact[h], h
        for t in range(3):
            assert row[f"n_est_raw_r{t}"] == est(per_radius[t][h]), (h, t)
        sk2 = per_radius[2][h]
        assert row.zero_regs_r2 == M - len(sk2), h
        assert row.register_sum_r2 == sum(sk2.values()), h
        vec = ",".join(str(sk2.get(b, 0)) for b in range(M))
        assert row.regs_md5_r2 == hashlib.md5(vec.encode()).hexdigest(), h
    # monotone by construction, and the corpus must exercise both hops
    assert (got.n_est_raw_r1 >= got.n_est_raw_r0).all()
    assert (got.n_est_raw_r2 >= got.n_est_raw_r1).all()
    assert (got.n_est_raw_r1 > got.n_est_raw_r0).any(), "radius-1 dead"
    assert (got.n_exact_r2 > 1).any(), "graph has no edges?"
    assert (
        got.n_est_raw_r2 > got.n_est_raw_r1
    ).any(), "radius-2 propagation dead — 2-hop reach adds nothing"
