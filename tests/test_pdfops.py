"""PDF text extraction: pure-Python parser units (escapes, hex strings, TJ
arrays, FlateDecode, multi-stream) plus the Spark synthesis -> extract ->
DuckDB-oracle round trip."""

import zlib

import duckdb
import pytest

from htmlgraft import pdfops


def _wrap(content: bytes, flate: bool = False) -> bytes:
    body = zlib.compress(content) if flate else content
    filt = b" /Filter /FlateDecode" if flate else b""
    return (
        b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(body)).encode() + filt
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF"
    )


def test_simple_tj_lines():
    text, _, shows = pdfops.extract_pdf_text(_wrap(
        b"BT /F1 12 Tf 72 720 Td (alpha beta) Tj 0 -14 Td (gamma) Tj ET"
    ))
    assert text == "alpha beta\ngamma"
    assert shows == 2


def test_flate_stream_roundtrip():
    content = b"BT 72 720 Td (compressed payload) Tj ET"
    assert pdfops.extract_pdf_text(_wrap(content, flate=True))[0] == \
        pdfops.extract_pdf_text(_wrap(content))[0] == "compressed payload"


def test_escapes_and_hex():
    text, _, _ = pdfops.extract_pdf_text(_wrap(
        rb"BT (a\(b\) \\ \101\12x) Tj (q" + b"\\\nr) Tj "
        b"<68 656C6C 6F> Tj ET"
    ))
    # \101 = 'A' (octal), \12 = LF, backslash-EOL is a line continuation,
    # hex string decodes ignoring whitespace; same-baseline shows concatenate
    assert text == "a(b) \\ A\nxqrhello"


def test_tj_array_ignores_kerning():
    text, _, shows = pdfops.extract_pdf_text(_wrap(
        b"BT [ (to) -120 (get) 33 (her) ] TJ ET"
    ))
    assert text == "together"
    assert shows == 1


def test_tstar_and_quote_ops():
    text, _, _ = pdfops.extract_pdf_text(_wrap(
        b"BT (one) Tj T* (two) Tj (three)' ET"
    ))
    assert text == "one\ntwo\nthree"


def test_horizontal_td_does_not_break_line():
    text, _, _ = pdfops.extract_pdf_text(_wrap(
        b"BT (a) Tj 50 0 Td (b) Tj 0 -14 Td (c) Tj ET"
    ))
    assert text == "ab\nc"


def test_multiple_streams_concatenate():
    one = _wrap(b"BT (first) Tj ET")
    two = _wrap(b"BT (second) Tj ET")
    text, _, shows = pdfops.extract_pdf_text(one + two)
    assert text == "first\nsecond"
    assert shows == 2


def test_non_pdf_and_unknown_filter_raise():
    with pytest.raises(NotImplementedError):
        pdfops.extract_pdf_text(b"GIF89a not a pdf")
    bad = (b"%PDF-1.4\n<< /Length 3 /Filter /DCTDecode >>\nstream\nabc\n"
           b"endstream\n%%EOF")
    with pytest.raises(NotImplementedError):
        pdfops.extract_pdf_text(bad)


def test_spark_roundtrip_matches_oracle(spark, sf_dir):
    got = {
        r["doc_id"]: (r["text"], r["n_pages"], r["n_text_shows"])
        for r in pdfops.pdf_extract_text(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_dir}/documents.parquet'"
    )
    exp = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(pdfops.pdf_extract_oracle_sql()).fetchall()
    }
    assert got == exp
    assert all(v[1] == 1 for v in got.values())  # one page each


def test_synth_pdf_is_well_formed(spark, sf_dir):
    """The synthesized xref offsets must be byte-accurate: each 'N 0 obj'
    must start exactly at its xref offset, and startxref must point at the
    xref keyword."""
    blob = bytes(pdfops.pdf_df(spark, sf_dir).limit(1).collect()[0]["pdf"])
    # NB plain rfind(b"xref") would match inside the later 'startxref'
    xref_pos = blob.rfind(b"\nxref\n") + 1
    assert blob[blob.rfind(b"startxref"):].split()[1] == str(xref_pos).encode()
    table = blob[xref_pos:].split(b"\n")[3:8]  # five in-use entries
    for i, line in enumerate(table, start=1):
        off = int(line.split()[0])
        want = f"{i} 0 obj".encode()
        assert blob[off:off + len(want)] == want
