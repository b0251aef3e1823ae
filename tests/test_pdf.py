"""PDF synthesizer + extractor (functions/pdf.py): round-trip
exactness over the full escape surface, xref vs sequential-scan
parity, stream-filter handling, and typed rejects. No Spark needed —
the codec is pure Python; the Spark plumbing is pinned by the
pdf_extract driver query."""

from __future__ import annotations

import zlib

import pytest

from vearch_spark.functions.pdf import (
    PdfDocument,
    extract_pdf_text,
    pdf_bytes,
    pdf_info,
)


def test_round_trip_multipage_both_modes():
    pages = [
        "hello world\nsecond line here\nthird",
        "page two starts\nwith (parens) and \\ backslash\nand\ttabs",
        "last page single line",
    ]
    for compress in (True, False):
        blob = pdf_bytes(pages, compress=compress)
        assert extract_pdf_text(blob) == "\n".join(pages)
        info = pdf_info(blob)
        assert info["version"] == "1.4"
        assert info["n_pages"] == 3
        # 3 fixed + 2/page + 1 per odd-index page (indirect /Length)
        assert info["n_objects"] == 3 + 6 + 1


def test_round_trip_full_latin1_and_nesting():
    # high bytes octal-escape; nested balanced parens are legal PDF
    text = "caf\xe9 \xff\x01 (nested (deep) parens) end"
    blob = pdf_bytes([text])
    assert extract_pdf_text(blob) == text


def test_hypothesis_round_trip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.text(
        alphabet=st.characters(
            codec="latin-1", exclude_characters="\n\r"
        ),
        max_size=60,
    )
    page = st.lists(line, min_size=1, max_size=5).map("\n".join)

    @settings(max_examples=60, deadline=None)
    @given(pages=st.lists(page, min_size=1, max_size=4),
           compress=st.booleans())
    def check(pages, compress):
        blob = pdf_bytes(pages, compress=compress)
        assert extract_pdf_text(blob) == "\n".join(pages)
        assert pdf_info(blob)["n_pages"] == len(pages)

    check()


def test_pdf15_xref_stream_round_trip():
    """PDF 1.5 layout: /ObjStm-packed dicts + predictor-coded /XRef
    stream — same text out, both compress modes."""
    pages = ["hello world\nsecond line", "page (two)\nwith \\ stuff"]
    for compress in (True, False):
        blob = pdf_bytes(pages, compress=compress, xref_stream=True)
        assert blob.startswith(b"%PDF-1.5")
        assert b"/ObjStm" in blob and b"/XRef" in blob
        assert b"/Predictor 12" in blob
        assert extract_pdf_text(blob) == "\n".join(pages)
        info = pdf_info(blob)
        assert info["version"] == "1.5" and info["n_pages"] == 2
        doc = PdfDocument(blob)
        assert doc.compressed  # members resolved via type-2 entries
        # top-level (2 content + objstm + xref) + 5 packed members
        assert info["n_objects"] == 4 + 5


def test_pdf15_scan_fallback():
    """Corrupt startxref on a 1.5 file: the sequential scan must
    recover the ObjStm members and use the XRef dict as trailer."""
    pages = ["alpha\nbeta", "gamma"]
    blob = pdf_bytes(pages, xref_stream=True)
    bad = blob.replace(b"startxref", b"startxrEF")
    assert extract_pdf_text(bad) == "alpha\nbeta\ngamma"


def test_predictor_roundtrips():
    """_apply_predictor inverts every PNG filter tag and TIFF
    predictor 2 on synthetic rows."""
    import numpy as np

    from vearch_spark.functions.pdf import _apply_predictor

    rng = np.random.default_rng(7)
    cols = 7
    rows = [bytes(rng.integers(0, 256, cols, dtype=np.uint8)) for _ in range(6)]
    raw = b"".join(rows)
    # TIFF predictor 2: encode = horizontal difference
    enc2 = bytearray()
    for r in rows:
        enc2 += bytes([r[0]]) + bytes(
            (r[i] - r[i - 1]) & 0xFF for i in range(1, cols)
        )
    assert _apply_predictor(bytes(enc2), 2, cols) == raw
    # PNG tags 0..4: encode each row with its tag
    prev = bytes(cols)
    encp = bytearray()
    for tag, r in zip([0, 1, 2, 3, 4, 2], rows):
        encp.append(tag)
        for i in range(cols):
            a = r[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if tag == 0:
                pr = 0
            elif tag == 1:
                pr = a
            elif tag == 2:
                pr = b
            elif tag == 3:
                pr = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            encp.append((r[i] - pr) & 0xFF)
        prev = r
    assert _apply_predictor(bytes(encp), 12, cols) == raw


def test_hypothesis_round_trip_pdf15():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.text(
        alphabet=st.characters(codec="latin-1", exclude_characters="\n\r"),
        max_size=40,
    )
    page = st.lists(line, min_size=1, max_size=4).map("\n".join)

    @settings(max_examples=30, deadline=None)
    @given(pages=st.lists(page, min_size=1, max_size=3),
           compress=st.booleans())
    def check(pages, compress):
        blob = pdf_bytes(pages, compress=compress, xref_stream=True)
        assert extract_pdf_text(blob) == "\n".join(pages)
        assert pdf_info(blob)["n_pages"] == len(pages)

    check()


def test_scan_fallback_when_xref_corrupt():
    """A broken startxref offset must not lose the document — the
    sequential object scan reads the same pages."""
    blob = pdf_bytes(["alpha beta\ngamma", "delta"], compress=True)
    bad = blob.replace(b"startxref", b"startxrEF")
    assert extract_pdf_text(bad) == "alpha beta\ngamma\ndelta"


def test_kerned_tj_array_reassembles_exactly():
    """Odd lines are drawn as [(a) -20 (b)] TJ — kern numbers must
    contribute zero characters."""
    pages = ["first even line\nodd line drawn via TJ split\nlast"]
    blob = pdf_bytes(pages, compress=False)
    assert b"TJ" in blob  # the split form is actually present
    assert extract_pdf_text(blob) == pages[0]


def test_hex_string_and_quote_operators():
    """Hand-built content stream: hex strings, ' and \" show ops."""
    content = b"BT <48656C6C6F> Tj (line2) ' 1 2 (line3) \" ET"
    stream = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + b"4 0 obj << /Length %d >>\nstream\n%s\nendstream endobj\n"
        % (len(content), content)
    )
    blob = stream + b"trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_text(blob) == "Hello\nline2\nline3"


def test_unsupported_filter_and_predictor_reject_typed():
    blob = pdf_bytes(["text"], compress=True)
    with pytest.raises(ValueError, match="unsupported PDF filter"):
        extract_pdf_text(blob.replace(b"/FlateDecode", b"/LZWDecodee"[:11]))
    # predictor values outside TIFF-2 / PNG-10..15 reject typed
    from vearch_spark.functions.pdf import _apply_predictor

    with pytest.raises(ValueError, match="predictor"):
        _apply_predictor(b"\x00" * 8, 5, 8)


def test_encrypted_rejects_typed():
    blob = pdf_bytes(["secret"], compress=False)
    enc = blob.replace(
        b"trailer\n<< /Size", b"trailer\n<< /Encrypt 9 0 R /Size"
    )
    with pytest.raises(ValueError, match="encrypted"):
        pdf_info(enc)


def test_non_pdf_rejects_typed():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_text(b"GIF89a notapdf")
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_info(b"")


def test_corrupt_flate_rejects_typed():
    blob = pdf_bytes(["payload text"], compress=True)
    # find the stream payload and flip bytes inside it
    i = blob.index(b"stream\n") + 7
    j = blob.index(b"\nendstream", i)
    corrupted = blob[:i] + bytes(b ^ 0xFF for b in blob[i:j]) + blob[j:]
    with pytest.raises(ValueError, match="FlateDecode"):
        extract_pdf_text(corrupted)


def test_pages_must_be_nonempty_str_list():
    with pytest.raises(ValueError, match="non-empty list"):
        pdf_bytes([])
    with pytest.raises(ValueError, match="non-empty list"):
        pdf_bytes("just a string")  # type: ignore[arg-type]
    with pytest.raises(ValueError, match="latin-1"):
        pdf_bytes(["snow ☃"])


def test_indirect_length_stream_parses():
    """Odd page indexes write /Length as an indirect reference whose
    value object sits AFTER the stream — resolvable via xref."""
    blob = pdf_bytes(["p0", "p1 indirect"], compress=True)
    assert b" 0 R /Filter" in blob or b" 0 R >>" in blob
    doc = PdfDocument(blob)
    assert len(doc.pages()) == 2
    assert extract_pdf_text(blob) == "p0\np1 indirect"


def test_media_info_dispatches_pdf():
    from vearch_spark.functions.media import media_info

    blob = pdf_bytes(["one", "two\nlines"], compress=True)
    info = media_info(blob)
    assert info["kind"] == "document"
    assert info["container"] == "pdf"
    assert info["n_pages"] == 2
    assert info["pdf_version"] == "1.4"


def test_missing_length_falls_back_to_endstream_scan():
    content = b"BT (fallback works) Tj ET"
    blob = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << >>\nstream\n" + content + b"\nendstream endobj\n"
        b"trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(blob) == "fallback works"


def test_zlib_stream_containing_obj_header_bytes():
    """Flate payloads can contain 'N 0 obj' byte patterns; the
    xref-driven parse must not be fooled (lengths bound the skip)."""
    tricky = "decoy 5 0 obj endobj startxref inside text"
    blob = pdf_bytes([tricky], compress=False)  # raw content keeps bytes
    assert extract_pdf_text(blob) == tricky
