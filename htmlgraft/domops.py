"""CSS-selector queries over the parsed DOM — the API a parser consumer
actually reaches for ("give me every ``table.meta td``"), layered on the
SAME byte-identical tokenize → tree-build pipeline as extraction.

The reference exposes parse + traversal only (/root/reference/lib/
traversal.js:18-53); selectors are a value-add query surface over the same
DOM, so matching semantics follow OUR tree shape: synthetic ``#``-prefixed
wrapper nodes (e.g. ``#reparented``) are flattened out of ancestor paths,
exactly as the reference's traversal flattens them out of its event stream
(traversal.js:73-77).

Selector subset (the high-traffic 90%): tag, ``*``, ``#id``, ``.class``,
``[attr]``, ``[attr=value]`` (value optionally quoted), compounds thereof,
and the descendant (whitespace) and child (``>``) combinators.  Attribute
values must not contain whitespace or ``>`` (the tokenizer splits on
those) — pct-encode them, as a url would anyway.  Matching is the standard
right-to-left walk with ancestor backtracking.

Scale shape: selectors are parsed ONCE on the driver (malformed selectors
fail fast, not per-task); each page is parsed ONCE and all selectors run
against that single DOM; the operator is one Arrow-batched map riding the
same salted url-hash partitioning as the parse itself — no shuffle, no
per-row Python round trips.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .nodes import Element

_COMPOUND_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?"
    r"(?P<rest>(?:[#.][-\w]+|\[[^\]]+\])*)$"
)
_PART_RE = re.compile(r"[#.][-\w]+|\[[^\]]+\]")


def _parse_compound(s: str):
    """One compound selector → (tag, id, classes, attrs) where attrs is a
    tuple of (name, value-or-None)."""
    m = _COMPOUND_RE.match(s)
    if not m or (m.group("tag") is None and not m.group("rest")):
        raise ValueError(f"bad selector compound: {s!r}")
    tag, id_, classes, attrs = m.group("tag"), None, set(), []
    for part in _PART_RE.findall(m.group("rest")):
        if part[0] == "#":
            id_ = part[1:]
        elif part[0] == ".":
            classes.add(part[1:])
        else:  # [attr] or [attr=value]
            inner = part[1:-1]
            name, eq, value = inner.partition("=")
            if not name:
                raise ValueError(f"bad attribute selector: {part!r}")
            if eq:
                if len(value) >= 2 and value[0] == value[-1] and \
                        value[0] in "\"'":
                    value = value[1:-1]
                attrs.append((name.lower(), value))
            else:
                attrs.append((name.lower(), None))
    return (tag.lower() if tag else None, id_, frozenset(classes),
            tuple(attrs))


def parse_selector(sel: str):
    """Full selector → tuple of (combinator, compound); combinator relates
    each compound to the one before it (' ' descendant, '>' child; the
    first entry's combinator is unused)."""
    toks = re.findall(r">|\S+", sel)
    parts = []
    comb = " "
    for t in toks:
        if t == ">":
            if not parts or comb == ">":
                raise ValueError(f"misplaced '>' in selector: {sel!r}")
            comb = ">"
        else:
            parts.append((comb, _parse_compound(t)))
            comb = " "
    if not parts or comb == ">":
        raise ValueError(f"empty or dangling selector: {sel!r}")
    return tuple(parts)


def _el_matches(el, comp) -> bool:
    tag, id_, classes, attrs = comp
    if tag is not None and tag != "*" and el.name != tag:
        return False
    a = el.attrs or {}
    if id_ is not None and a.get("id") != id_:
        return False
    if classes and not classes <= set((a.get("class") or "").split()):
        return False
    for name, value in attrs:
        if name not in a:
            return False
        if value is not None and a[name] != value:
            return False
    return True


def _match_at(path, i_path, parts, i_part) -> bool:
    # right-to-left with backtracking; recursion depth is len(parts), not
    # document depth, so adversarially deep documents cannot blow the stack
    if not _el_matches(path[i_path], parts[i_part][1]):
        return False
    if i_part == 0:
        return True
    comb = parts[i_part][0]
    if comb == ">":
        return i_path > 0 and _match_at(path, i_path - 1, parts, i_part - 1)
    return any(
        _match_at(path, j, parts, i_part - 1)
        for j in range(i_path - 1, -1, -1)
    )


def select(document, parts):
    """Yield matching Elements of one parsed document in document order.
    Iterative walk (explicit stack): the ancestor path excludes synthetic
    ``#`` wrappers but still descends through them."""
    path = []
    last = len(parts) - 1
    # frame = [children, next_index, pops_path_on_exit]
    stack = [[document.children, 0, False]]
    while stack:
        top = stack[-1]
        children, i = top[0], top[1]
        if i >= len(children):
            if top[2]:
                path.pop()
            stack.pop()
            continue
        top[1] = i + 1
        node = children[i]
        if type(node) is Element:
            if node.name[:1] == "#":
                stack.append([node.children, 0, False])
            else:
                path.append(node)
                if _match_at(path, len(path) - 1, parts, last):
                    yield node
                stack.append([node.children, 0, True])


SELECT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("selector", StringType()),
        StructField("match_pos", LongType()),
        StructField("tag", StringType()),
        StructField("text", StringType()),
    ]
)


def select_css_df(pages: DataFrame, selectors,
                  num_parts: int | None = None) -> DataFrame:
    """(url, selector, match_pos, tag, text) for every element of every
    page matching each selector; match_pos is the 1-based document-order
    index within (url, selector), text is the whitespace-collapsed subtree
    text (same collapse as link anchors).  Pages that fail to parse emit
    no rows (the documented links contract)."""
    spark = pages.sparkSession
    from .job import with_partitioning

    parsed = tuple((s, parse_selector(s)) for s in selectors)
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    df = with_partitioning(pages.select("url", "html"), num_parts)

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .linkops import _parse_doc, _subtree_text

        for pdf in batches:
            out = {k: [] for k in ("url", "selector", "match_pos", "tag",
                                   "text")}
            for url, raw in zip(pdf["url"].tolist(), pdf["html"].tolist()):
                try:
                    doc = _parse_doc(raw)
                except Exception:
                    continue
                for sel, parts in parsed:
                    for k, el in enumerate(select(doc, parts), start=1):
                        out["url"].append(url)
                        out["selector"].append(sel)
                        out["match_pos"].append(k)
                        out["tag"].append(el.name)
                        out["text"].append(_subtree_text(el))
            yield pd.DataFrame(out)

    return df.mapInPandas(_batch, SELECT_SCHEMA)


# --- gated query -------------------------------------------------------------

# One selector per feature family: class-on-tag + descendant, compound
# class chain, id + child chain, attribute value match.
GATE_SELECTORS = (
    "table.meta td",
    "nav a.active",
    "div#main > p > b",
    'footer a[href="/tos"]',
)


def run_dom_select(spark, sf_dir: str) -> DataFrame:
    from .corpus import pages_df

    return select_css_df(pages_df(spark, sf_dir), GATE_SELECTORS)


def dom_select_oracle_sql() -> str:
    """Relational restatement of every gate selector's matches: the meta
    table's td grid, the nav's active link, one <b> per repeated
    paragraph (first word of the clean text), and the /tos footer link."""
    from .corpus import pages_oracle_cte

    return (
        pages_oracle_cte()
        + """
      select url, 'table.meta td' as selector,
             cast(c.pos as bigint) as match_pos, 'td' as tag,
             case c.pos when 1 then cast(e.doc_id as varchar)
                        when 2 then e.lang
                        else 'more like this' end as text
      from expected e cross join (values (1), (2), (3)) c(pos)
      union all
      select url, 'nav a.active', cast(1 as bigint), 'a', e.source
      from expected e
      union all
      select e.url, 'div#main > p > b',
             cast(unnest(range(1, d.r + 1)) as bigint), 'b',
             string_split(d.clean, ' ')[1]
      from expected e join derived d on d.doc_id = e.doc_id
      union all
      select url, 'footer a[href="/tos"]', cast(1 as bigint), 'a', 'terms'
      from expected e
    """
    )
