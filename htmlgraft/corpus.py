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


def _html_expr() -> str:
    """Spark SQL expression building the page html (string) from columns
    doc_id, source, lang, clean, host, r, partner."""
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
        "'<html lang=\"', lang, '\"><head><meta charset=\"utf-8\">',"
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


def html_expr_duck() -> str:
    """DuckDB restatement of ``_html_expr`` (columns doc_id, source, lang,
    clean, host, r, partner in scope) — an INDEPENDENT second spelling of
    the page synthesis used by container-level oracles (warcops) to verify
    whole-page byte accounting.  Dialect deltas: cast as varchar,
    substring_index -> split_part; everything else is shared SQL."""
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
        "'<html lang=\"', lang, '\"><head><meta charset=\"utf-8\">',"
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

def pages_oracle_cte(documents_ref: str = "documents", multiplier: int = 1) -> str:
    """DuckDB CTE body computing per-page EXPECTED pipeline outputs directly
    from the documents table (no parsing): url, lang, expected extracted
    text, host, r, ts_seconds."""
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
               {CLEAN_DUCK} as clean,
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
