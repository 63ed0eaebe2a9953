"""Deterministic Common-Crawl-style page corpus, derived from the driver's
``documents`` table (doc_id, text, lang, source, n_chars) by pure SQL
expressions -- no RNG, no external data.

Every derived quantity (url, host, repetition factor R, the cleaned text) is
expressible in BOTH Spark SQL and DuckDB SQL, which is what makes the full
parse+extract pipeline value-checkable by the driver's DuckDB oracle: the
expected extracted text for a synthesized page is
    rtrim(repeat(clean || chr(10), R), chr(10))
where ``clean`` is the whitespace-collapsed document text.

Corpus shape (SURVEY.md §2B "Synthetic source", FIXTURES.md §3b):
* one page per document row; the page wraps the text in R <p> paragraphs
  (first word <b>-wrapped) inside <div id=main>, surrounded by boilerplate
  (nav/header/aside/footer with links, a decoration table, comments, a
  script/style block, an svg island) that the extractor must strip;
* hosts are skewed: 20% of pages land on one heavy host (skew handling
  evidence), and doc_id % 199 == 0 pages are oversized (R multiplied by 50,
  pages up to ~600 KB);
* ``bench_multiplier`` unions shifted copies for larger benchmark corpora.
"""

from __future__ import annotations

# --- dialect-shared SQL fragments (valid in Spark SQL and DuckDB) ---

# whitespace-collapsed text; Spark regexp_replace is global by default,
# DuckDB needs the 'g' flag -> two variants.  NB Spark SQL string literals
# process backslash escapes ('\f' would collapse to a literal 'f' and the
# regex would eat f's from the text!) so the Spark variant doubles them;
# DuckDB regular strings pass backslashes through to RE2 untouched.
CLEAN_SPARK = "trim(regexp_replace(text, '[\\\\t\\\\n\\\\r\\\\f ]+', ' '))"
CLEAN_DUCK = "trim(regexp_replace(text, '[\\t\\n\\r\\f ]+', ' ', 'g'))"

# paragraph repetition factor; doc_id % 199 == 0 pages are oversized
R_EXPR = (
    "cast((1 + (doc_id * 37) % 20) * (case when doc_id % 199 = 0 then 50 else 1 end) as int)"
)

HOST_EXPR = (
    "case when doc_id % 5 = 0 then 'popular.example.com' "
    "else concat('site-', cast(doc_id % 211 as string), '.example.org') end"
)
HOST_EXPR_DUCK = (
    "case when doc_id % 5 = 0 then 'popular.example.com' "
    "else concat('site-', cast(doc_id % 211 as varchar), '.example.org') end"
)

URL_EXPR = "concat('https://', host, '/', source, '/', cast(doc_id as string))"
URL_EXPR_DUCK = "concat('https://', host, '/', source, '/', cast(doc_id as varchar))"

# cross-host "partner" footer link target: gives the corpus a non-trivial
# host-level link graph (extract_links -> link_hostgraph -> pagerank_hosts)
# while staying in boilerplate, so extracted main text is unchanged.
# doc_id % 13 == 0 pages point at the heavy host -> skewed in-degree.
PARTNER_EXPR = (
    "case when doc_id % 13 = 0 then 'popular.example.com' "
    "else concat('site-', cast((doc_id * 7 + 3) % 211 as string), '.example.org') end"
)
PARTNER_EXPR_DUCK = (
    "case when doc_id % 13 = 0 then 'popular.example.com' "
    "else concat('site-', cast((doc_id * 7 + 3) % 211 as varchar), '.example.org') end"
)

# epoch seconds for warc_ts (kept as a number for engine-neutral compares)
TS_SECONDS_EXPR = "1709251200 + doc_id % 31536000"


def expected_text_duck(clean: str = CLEAN_DUCK, r: str = R_EXPR) -> str:
    """DuckDB expression: the extracted main text the pipeline must emit."""
    return f"rtrim(repeat({clean} || chr(10), {r}), chr(10))"


_ESCAPE = (
    "replace(replace(replace({src}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
)


# default meta tag of the synthesized pages; charset_pages_sql swaps it per
# family (a lying meta, a windows-1252 meta, or none) to exercise the decode
_META_UTF8 = "'<meta charset=\"utf-8\">'"


def _html_expr(meta: str = _META_UTF8) -> str:
    """Spark SQL expression building the page html (string) from columns
    doc_id, source, lang, clean, host, r, partner.  ``meta`` is a SQL string
    expression for the head's meta tag (default keeps the output
    byte-identical to the original single-variant template)."""
    esc = _ESCAPE.format(src="clean")
    first = "substring_index(clean, ' ', 1)"
    # paragraph: <p><b>First</b> rest-of-text</p>, repeated R times; when the
    # text has a single word the <b> wrap covers it all and rest is empty.
    para = (
        "concat('<p><b>', " + _ESCAPE.format(src=first) + ", '</b>', "
        f"substr({esc}, length({_ESCAPE.format(src=first)}) + 1), '</p>')"
    )
    return (
        "concat("
        "case when doc_id % 7 = 0 then '' else '<!DOCTYPE html>' end,"
        f"'<html lang=\"', lang, '\"><head>', {meta},"
        "'<title>Doc ', cast(doc_id as string), ' — ', source, '</title>',"
        "'<style>p{margin:0 0 1em} /* <p> in style */</style>',"
        "'<script>var d=', cast(doc_id as string), ';if(d<0){x(\"</div>\")}</script>',"
        "'</head><body>',"
        "'<nav><ul><li><a href=\"/\">Home</a></li><li><a href=/', source, "
        "' class=active>', source, '</a></li><li><a href=\"/about?a=1&b=2\">About</a></li></ul></nav>',"
        "'<header><h1>', host, '</h1><p>breadcrumb › ', source, '</p></header>',"
        "'<!-- page ', cast(doc_id as string), ' -->',"
        "'<div id=main class=\"content article\">',"
        f"repeat({para}, r),"
        "'</div>',"
        "'<table class=meta><tr><th>id<td>', cast(doc_id as string), "
        "'<tr><th>lang<td>', lang, "
        "'<tr><th>link<td><a href=\"/more\">more like this</a></table>',"
        "'<aside><svg viewBox=\"0 0 10 10\"><circle r=\"4\"/><desc>deco</desc></svg>',"
        "'<ul><li><a href=\"/r1\">related one</a><li><a href=\"/r2\">related two</a></ul></aside>',"
        "'<footer>&copy; 2026 ', host, ' <a href=\"/tos\">terms</a> ',"
        "'<a href=\"https://', partner, '/\">partner</a></footer>',"
        "'</body></html>')"
    )


def pages_sql(documents_ref: str, multiplier: int = 1) -> str:
    """Spark SQL producing the pages table
    (url string, warc_ts timestamp, html binary, text string, lang string
     [+ doc_id, host, r, ts_seconds for lineage/partitioning])
    from a documents relation (parquet path or view name).

    multiplier > 1 unions shifted deterministic copies (doc_id offset by
    1_000_000 * k; page content identical per copy, urls distinct) to scale
    the benchmark corpus.
    """
    copies = []
    for k in range(multiplier):
        copies.append(
            f"select doc_id + {k} * 1000000 as doc_id, text, lang, source "
            f"from {documents_ref}"
        )
    base = " union all ".join(copies)
    return f"""
      with docs as ({base}),
      derived as (
        select doc_id, text, lang, source,
               {CLEAN_SPARK} as clean,
               {HOST_EXPR} as host,
               {R_EXPR} as r,
               {PARTNER_EXPR} as partner,
               {TS_SECONDS_EXPR} as ts_seconds
        from docs
      )
      select
        {URL_EXPR} as url,
        timestamp_seconds(ts_seconds) as warc_ts,
        encode({_html_expr()}, 'UTF-8') as html,
        text,
        lang,
        doc_id, host, r, ts_seconds
      from derived
    """


def pages_df(spark, sf_dir: str, multiplier: int = 1, num_parts: int | None = None):
    """DataFrame of synthesized pages for the documents table in sf_dir.

    ``num_parts`` repartitions the (tiny) document rows BEFORE the html
    synthesis projection: the source parquet is a single small file, so
    without this the string building runs in as few tasks as there are
    union branches and serializes the whole downstream pipeline.
    """
    path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    if multiplier > 1:
        from functools import reduce

        docs = reduce(
            lambda a, b: a.unionAll(b),
            [
                docs.selectExpr(
                    f"doc_id + {k} * 1000000 as doc_id", "text", "lang", "source"
                )
                for k in range(multiplier)
            ],
        )
    if num_parts:
        docs = docs.repartition(num_parts)
    docs.createOrReplaceTempView("__graft_documents")
    return spark.sql(pages_sql("__graft_documents", 1))


def html_expr_duck(meta: str = _META_UTF8) -> str:
    """DuckDB restatement of ``_html_expr`` (columns doc_id, source, lang,
    clean, host, r, partner in scope) — an INDEPENDENT second spelling of
    the page synthesis used by container-level oracles (warcops) to verify
    whole-page byte accounting.  Dialect deltas: cast as varchar,
    substring_index -> split_part; everything else is shared SQL.  ``meta``
    mirrors ``_html_expr``'s parameter and must be passed identically."""
    esc = _ESCAPE.format(src="clean")
    first = "split_part(clean, ' ', 1)"
    first_esc = _ESCAPE.format(src=first)
    para = (
        f"concat('<p><b>', {first_esc}, '</b>', "
        f"substr({esc}, length({first_esc}) + 1), '</p>')"
    )
    return (
        "concat("
        "case when doc_id % 7 = 0 then '' else '<!DOCTYPE html>' end,"
        f"'<html lang=\"', lang, '\"><head>', {meta},"
        "'<title>Doc ', cast(doc_id as varchar), ' — ', source, '</title>',"
        "'<style>p{margin:0 0 1em} /* <p> in style */</style>',"
        "'<script>var d=', cast(doc_id as varchar), ';if(d<0){x(\"</div>\")}</script>',"
        "'</head><body>',"
        "'<nav><ul><li><a href=\"/\">Home</a></li><li><a href=/', source, "
        "' class=active>', source, '</a></li><li><a href=\"/about?a=1&b=2\">About</a></li></ul></nav>',"
        "'<header><h1>', host, '</h1><p>breadcrumb › ', source, '</p></header>',"
        "'<!-- page ', cast(doc_id as varchar), ' -->',"
        "'<div id=main class=\"content article\">',"
        f"repeat({para}, r),"
        "'</div>',"
        "'<table class=meta><tr><th>id<td>', cast(doc_id as varchar), "
        "'<tr><th>lang<td>', lang, "
        "'<tr><th>link<td><a href=\"/more\">more like this</a></table>',"
        "'<aside><svg viewBox=\"0 0 10 10\"><circle r=\"4\"/><desc>deco</desc></svg>',"
        "'<ul><li><a href=\"/r1\">related one</a><li><a href=\"/r2\">related two</a></ul></aside>',"
        "'<footer>&copy; 2026 ', host, ' <a href=\"/tos\">terms</a> ',"
        "'<a href=\"https://', partner, '/\">partner</a></footer>',"
        "'</body></html>')"
    )


# --- DuckDB oracle mirrors -------------------------------------------------

def pages_oracle_cte(documents_ref: str = "documents", multiplier: int = 1,
                     marker: str = "") -> str:
    """DuckDB CTE body computing per-page EXPECTED pipeline outputs directly
    from the documents table (no parsing): url, lang, expected extracted
    text, host, r, ts_seconds.  ``marker`` is appended to the cleaned text
    (the charset corpus plants a non-ASCII marker in the main text so a
    decode bug cannot cancel out)."""
    copies = []
    for k in range(multiplier):
        copies.append(
            f"select doc_id + {k} * 1000000 as doc_id, text, lang, source "
            f"from {documents_ref}"
        )
    base = " union all ".join(copies)
    clean = CLEAN_DUCK if not marker else f"concat({CLEAN_DUCK}, '{marker}')"
    return f"""
      with docs as ({base}),
      derived as (
        select doc_id, text, lang, source,
               {clean} as clean,
               {HOST_EXPR_DUCK} as host,
               {R_EXPR} as r,
               {PARTNER_EXPR_DUCK} as partner,
               {TS_SECONDS_EXPR} as ts_seconds
        from docs
      ),
      expected as (
        select
          {URL_EXPR_DUCK} as url,
          lang, doc_id, source, host, r, partner, ts_seconds,
          {expected_text_duck("clean", "r")} as text
        from derived
      )
    """


# --- charset corpus (non-UTF-8 page families) --------------------------------

# non-ASCII marker planted in every charset-corpus page's MAIN text: é is
# 1 byte in cp1252 vs 2 in UTF-8, and the em dash exists in cp1252 only via
# byte 0x97 — any decode-branch bug turns the marker into mojibake and the
# extract oracle catches it (a pure-ASCII corpus cannot cover decode at all).
CHARSET_MARKER = " café — fin"

_META_1252 = "'<meta charset=\"windows-1252\">'"

# cp1252-only chars the shared template uses (title em dash, breadcrumb ›,
# marker): U+2014 -> 0x97 and U+203A -> 0x9B under windows-1252.  Spark can
# only ENCODE latin-1, which has no mapping for either — so the synthesis
# translates them to the control chars U+0097/U+009B first (latin-1 encodes
# those as single bytes 0x97/0x9B), producing exactly the bytes a cp1252
# decoder maps back to the originals.  é (U+00E9) passes latin-1 directly.
_TO_CP1252 = (
    "encode(translate({src}, '—›', concat(chr(151), chr(155))), 'ISO-8859-1')"
)


def charset_pages_sql(documents_ref: str) -> str:
    """Spark SQL: the charset-coverage corpus — same page template, six
    byte-level families by doc_id % 6 that exercise every prescan branch
    (htmlgraft/encoding.py):

    0: UTF-8 bytes with BOM and a LYING ``<meta charset=windows-1252>`` —
       the BOM must win (decoding per the meta would mojibake the marker);
    1: windows-1252 bytes declared by ``<meta charset=windows-1252>`` —
       the meta branch with a genuinely non-UTF-8 payload;
    2: windows-1252 bytes with NO meta and no BOM — the spec-default branch;
    3: plain UTF-8 with the standard utf-8 meta — the control family;
    4: UTF-16LE bytes behind an FF FE BOM (the meta tag inside is
       NUL-interleaved, so only the BOM can identify it);
    5: UTF-16BE bytes behind an FE FF BOM.

    The expected extracted text is identical across families (the decoded
    string is family-invariant by construction), so the oracle stays
    relational: pages_oracle_cte(marker=CHARSET_MARKER)."""
    h_lie = _html_expr(_META_1252)
    h_1252 = _html_expr(_META_1252)
    h_none = _html_expr("''")
    h_utf8 = _html_expr()
    return f"""
      with docs as (select doc_id, text, lang, source from {documents_ref}),
      derived as (
        select doc_id, text, lang, source,
               concat({CLEAN_SPARK}, '{CHARSET_MARKER}') as clean,
               {HOST_EXPR} as host,
               {R_EXPR} as r,
               {PARTNER_EXPR} as partner,
               {TS_SECONDS_EXPR} as ts_seconds
        from docs
      ),
      built as (
        select doc_id, text, lang, source, host, r, ts_seconds,
               case cast(doc_id % 6 as int)
                 when 0 then {h_lie}
                 when 1 then {h_1252}
                 when 2 then {h_none}
                 else {h_utf8}
               end as hs
        from derived
      )
      select {URL_EXPR} as url,
             timestamp_seconds(ts_seconds) as warc_ts,
             case cast(doc_id % 6 as int)
               when 0 then concat(unhex('EFBBBF'), encode(hs, 'UTF-8'))
               when 1 then {_TO_CP1252.format(src="hs")}
               when 2 then {_TO_CP1252.format(src="hs")}
               when 4 then concat(unhex('FFFE'), encode(hs, 'UTF-16LE'))
               when 5 then concat(unhex('FEFF'), encode(hs, 'UTF-16BE'))
               else encode(hs, 'UTF-8')
             end as html,
             text, lang, doc_id, host, r, ts_seconds
      from built
    """


def pages_charset_df(spark, sf_dir: str):
    """DataFrame of charset-family pages for the documents table in sf_dir."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("__graft_documents_cs")
    return spark.sql(charset_pages_sql("__graft_documents_cs"))
