"""PDF text extraction over binary columns (north-rule "PDF/layout parse").

The EXTRACTOR is a real, from-scratch parser of the public PDF format
(ISO 32000 subset): it locates content streams by ``stream``/``endstream``
delimiters (robust scan, the strategy real-world extractors use for files
with broken xref tables), inflates ``/FlateDecode`` streams with zlib,
tokenizes the content stream, and reassembles page text from the text
operators — ``BT``/``ET`` blocks, ``Tj``/``'``/``TJ`` show-text (string
literals with the full escape set plus hex strings), and ``Td``/``TD``/
``T*`` line positioning (a vertical move starts a new output line).  It
works on real simple PDFs, not only the synthetic ones.

The SOURCE synthesizes byte-accurate single-page PDFs (valid xref offsets,
correct /Length) entirely in Spark SQL string expressions — zero Python —
wrapping each document's text into 8-word lines shown with ``Tj``.  The
DuckDB oracle recomputes the expected extracted text relationally (the same
8-word wrap), so tokenizer or operator-handling bugs in the Python extractor
surface as value mismatches.

Scale shape: pure map (no shuffle); blobs ride Arrow into pandas; batches
are byte-capped like job.py so one giant PDF cannot balloon a worker.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

WORDS_PER_LINE = 8

PDF_TEXT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("n_pages", LongType()),
    StructField("n_text_shows", LongType()),
])


# --- SQL-side synthesis ------------------------------------------------------

def _lines_expr(duck: bool) -> str:
    """SQL: documents.text -> array of 8-word lines (shared wrap logic)."""
    w = WORDS_PER_LINE
    if duck:
        return (
            f"list_transform(generate_series(0, ((len(ws) + {w - 1}) // {w}) - 1), "
            f"i -> array_to_string(ws[(i * {w} + 1):(i * {w} + {w})], ' '))"
        )
    return (
        f"transform(sequence(0, cast(floor((size(ws) + {w - 1}) / {w}) as int) - 1), "
        f"i -> array_join(slice(ws, i * {w} + 1, {w}), ' '))"
    )


def pdf_df(spark, sf_dir: str) -> DataFrame:
    """Synthesize a valid single-page PDF per document in pure Spark SQL:
    catalog/pages/page objects, an uncompressed content stream showing the
    8-word-wrapped text line by line, a byte-accurate xref table and
    trailer.  (FlateDecode streams cannot be built in SQL — that path is
    covered by a Python round-trip unit test.)"""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("__pdf_docs")
    nl = "chr(10)"
    return spark.sql(f"""
        with lines as (
          select doc_id,
                 {_lines_expr(False)} as ls
          from (select doc_id, split(text, ' ') as ws from __pdf_docs)
        ),
        objs as (
          select doc_id,
            concat('%PDF-1.4', {nl}) as hd,
            concat('1 0 obj', {nl},
                   '<< /Type /Catalog /Pages 2 0 R >>', {nl},
                   'endobj', {nl}) as o1,
            concat('2 0 obj', {nl},
                   '<< /Type /Pages /Kids [3 0 R] /Count 1 >>', {nl},
                   'endobj', {nl}) as o2,
            concat('3 0 obj', {nl},
                   '<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] ',
                   '/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>',
                   {nl}, 'endobj', {nl}) as o3,
            concat('BT /F1 12 Tf 72 720 Td (',
                   array_join(ls, concat(') Tj 0 -14 Td (')),
                   ') Tj ET') as content,
            size(ls) as n_lines
          from lines
        ),
        objs2 as (
          select doc_id, hd, o1, o2, o3, n_lines,
            concat('4 0 obj', {nl},
                   '<< /Length ', cast(length(content) as string), ' >>', {nl},
                   'stream', {nl}, content, {nl}, 'endstream', {nl},
                   'endobj', {nl}) as o4,
            concat('5 0 obj', {nl},
                   '<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>',
                   {nl}, 'endobj', {nl}) as o5
          from objs
        ),
        offs as (
          select doc_id, hd, o1, o2, o3, o4, o5, n_lines,
            length(hd) as f1,
            length(hd) + length(o1) as f2,
            length(hd) + length(o1) + length(o2) as f3,
            length(hd) + length(o1) + length(o2) + length(o3) as f4,
            length(hd) + length(o1) + length(o2) + length(o3) + length(o4) as f5,
            length(hd) + length(o1) + length(o2) + length(o3) + length(o4)
              + length(o5) as fx
          from objs2
        )
        select doc_id, n_lines,
          encode(concat(hd, o1, o2, o3, o4, o5,
            'xref', {nl}, '0 6', {nl},
            '0000000000 65535 f ', {nl},
            lpad(cast(f1 as string), 10, '0'), ' 00000 n ', {nl},
            lpad(cast(f2 as string), 10, '0'), ' 00000 n ', {nl},
            lpad(cast(f3 as string), 10, '0'), ' 00000 n ', {nl},
            lpad(cast(f4 as string), 10, '0'), ' 00000 n ', {nl},
            lpad(cast(f5 as string), 10, '0'), ' 00000 n ', {nl},
            'trailer', {nl}, '<< /Size 6 /Root 1 0 R >>', {nl},
            'startxref', {nl}, cast(fx as string), {nl}, '%%EOF'
          ), 'UTF-8') as pdf
        from offs
    """)


# --- real PDF parsing --------------------------------------------------------

# (?<!end): 'endstream' contains 'stream', which must not open a new stream
_STREAM_RE = re.compile(rb"(?<!end)stream\r?\n")
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"      # string literal (with escapes)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"
    rb"|/[^\s/<>()\[\]{}]*"        # name
    rb"|[-+]?[.0-9]+"              # number
    rb"|[A-Za-z'\"*]+",            # operator
    re.DOTALL,  # string literals span raw newlines (and \-EOL continuations)
)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_string(raw: bytes) -> bytes:
    """PDF string literal body -> bytes (escape set per ISO 32000 7.3.4.2:
    named escapes, 1-3 digit octal, backslash-EOL line continuation)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1:i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < n and j < i + 4 and raw[j:j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i:i + 1] == b"\n":
                i += 1
        else:  # lone backslash: dropped
            i += 1
    return bytes(out)


def _decode_hex_string(raw: bytes) -> bytes:
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def content_text_lines(data: bytes) -> tuple[list[str], int]:
    """Walk a content stream's text operators; returns (lines, n_shows).
    A vertical move (Td/TD with ty != 0, or T*) starts a new line; shown
    strings within a line join with no separator, separate shows on the
    same baseline are the caller's layout concern (our synthesis keeps one
    show per line)."""
    lines: list[str] = []
    cur: list[str] = []
    # operand stack of (kind, value): 's' decoded string bytes, 'n' number
    # bytes, '[' / ']' markers, 'o' other (names)
    stack: list[tuple[str, bytes]] = []
    in_text = False
    n_shows = 0

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def last_string() -> bytes:
        for kind, v in reversed(stack):
            if kind == "s":
                return v
        return b""

    for m in _TOKEN_RE.finditer(data):
        t = m.group()
        c = t[:1]
        if c == b"(":
            stack.append(("s", _unescape_string(t[1:-1])))
        elif c == b"<":
            stack.append(("s", _decode_hex_string(t[1:-1])))
        elif c == b"[" or c == b"]":
            stack.append((t.decode(), t))
        elif c == b"/":
            stack.append(("o", t))
        elif c.isdigit() or c in b"+-.":
            stack.append(("n", t))
        else:  # operator
            if t == b"BT":
                in_text = True
            elif t == b"ET":
                in_text = False
            elif in_text and t in (b"Td", b"TD"):
                # new line iff the vertical displacement is non-zero
                ty = stack[-1][1] if stack and stack[-1][0] == "n" else b"0"
                try:
                    moved = float(ty) != 0.0
                except ValueError:
                    moved = False
                if moved:
                    flush()
            elif in_text and t == b"T*":
                flush()
            elif in_text and (t == b"'" or t == b'"'):
                # quote operators: next line, then show the string operand
                flush()
                cur.append(last_string().decode("latin-1"))
                n_shows += 1
            elif in_text and t == b"Tj":
                cur.append(last_string().decode("latin-1"))
                n_shows += 1
            elif in_text and t == b"TJ":
                # show every string in the most recent [ ... ] group
                # (numbers between them are kerning adjustments, ignored)
                i = len(stack) - 1
                while i >= 0 and stack[i][0] != "[":
                    i -= 1
                cur.extend(
                    v.decode("latin-1")
                    for kind, v in stack[i + 1:] if kind == "s"
                )
                n_shows += 1
            stack.clear()
    flush()
    return lines, n_shows


def extract_pdf_text(blob: bytes) -> tuple[str, int, int]:
    """Parse one PDF: returns (text, n_pages, n_text_shows).  Content
    streams are found by delimiter scan; /FlateDecode streams are inflated;
    everything else raises (honest unsupported-filter signal)."""
    if not blob.startswith(b"%PDF-"):
        raise NotImplementedError("not a PDF")
    lines: list[str] = []
    n_shows = 0
    for m in _STREAM_RE.finditer(blob):
        start = m.end()
        end = blob.find(b"endstream", start)
        if end < 0:
            continue
        data = blob[start:end].rstrip(b"\r\n")
        dict_start = blob.rfind(b"<<", 0, m.start())
        head = blob[dict_start:m.start()] if dict_start >= 0 else b""
        if b"/Filter" in head:
            if b"/FlateDecode" not in head:
                raise NotImplementedError("unsupported stream filter")
            data = zlib.decompress(data)
        got, shows = content_text_lines(data)
        lines.extend(got)
        n_shows += shows
    n_pages = len(re.findall(rb"/Type\s*/Page[^s]", blob))
    return "\n".join(lines), n_pages, n_shows


def extract_text_df(pdfs: DataFrame, max_batch_bytes: int = 1 << 26) -> DataFrame:
    """Arrow-batched mapInPandas over (doc_id, pdf) binary columns."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_frame in batches:
            out = {k: [] for k in ("doc_id", "text", "n_pages", "n_text_shows")}
            acc = 0
            for doc_id, blob in zip(pdf_frame["doc_id"], pdf_frame["pdf"]):
                raw = bytes(blob)
                text, n_pages, n_shows = extract_pdf_text(raw)
                out["doc_id"].append(int(doc_id))
                out["text"].append(text)
                out["n_pages"].append(n_pages)
                out["n_text_shows"].append(n_shows)
                acc += len(raw)
                if acc >= max_batch_bytes:
                    yield pd.DataFrame(out)
                    out = {k: [] for k in out}
                    acc = 0
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return pdfs.select("doc_id", "pdf").mapInPandas(feats, PDF_TEXT_SCHEMA)


def pdf_extract_text(spark, sf_dir: str) -> DataFrame:
    """Query entry: synthesize PDFs, extract text + per-doc stats."""
    return extract_text_df(pdf_df(spark, sf_dir))


def pdf_extract_oracle_sql(docs: str = "documents") -> str:
    """DuckDB mirror: the expected extracted text is the same 8-word wrap of
    the source text, computed relationally — an independent pin on the
    whole binary round-trip (synthesis offsets, stream scan, tokenizer,
    escape handling, line assembly)."""
    return f"""
      with lines as (
        select doc_id, {_lines_expr(True)} as ls
        from (select doc_id, string_split(text, ' ') as ws from {docs})
      )
      select doc_id,
             array_to_string(ls, chr(10)) as text,
             cast(1 as bigint) as n_pages,
             cast(len(ls) as bigint) as n_text_shows
      from lines
      order by doc_id
    """
