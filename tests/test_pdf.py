"""PDF text extraction (functions/pdf + text.extract_pdf_text)."""

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.functions import pdf

pytestmark = pytest.mark.slow  # heavy tier (r15): run with -m slow


def test_roundtrip_flate_and_raw():
    pages = [["hello world", "second (line) with \\ escapes"], ["page two"]]
    want = "hello world\nsecond (line) with \\ escapes\npage two"
    for flate in (True, False):
        assert pdf.extract_text(pdf.encode(pages, flate=flate)) == want


def test_escapes_and_octal():
    body = (b"%PDF-1.4\n<< /Length 64 >>\nstream\n"
            b"BT (a\\(b\\)c) Tj T* (\\101\\102) Tj T* (tab\\there) Tj ET"
            b"\nendstream\n%%EOF")
    assert pdf.extract_text(body) == "a(b)c\nAB\ntab\there"


def test_tj_array_concatenates():
    body = (b"%PDF-1.4\n<< /Length 48 >>\nstream\n"
            b"BT [(Wor) -120 (ld)] TJ ET\nendstream\n%%EOF")
    assert pdf.extract_text(body) == "World"


def test_gates():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf.extract_text(b"hello")
    with pytest.raises(ValueError, match="Encrypt dictionary"):
        # /Encrypt pointing at a missing object is corrupt, not gated
        pdf.extract_text(b"%PDF-1.4\ntrailer\n<< /Size 2 /Encrypt 5 0 R >>")
    # /Encrypt mentioned in CONTENT is not encryption (review finding)
    doc = (b"%PDF-1.4\n<< /Length 30 >>\nstream\n"
           b"BT (the /Encrypt key spec) Tj ET\nendstream\n"
           b"trailer\n<< /Size 2 /Root 1 0 R >>")
    assert pdf.extract_text(doc) == "the /Encrypt key spec"
    # round 10: LZW-with-predictor DECODES now; a garbage body is a
    # corrupt-stream error, not a gate
    lzw_pred = (b"%PDF-1.4\n<< /Filter /LZWDecode /Predictor 12 "
                b"/Length 4 >>\nstream\nXXXX\nendstream")
    with pytest.raises(ValueError, match="LZW"):
        pdf.extract_text(lzw_pred)
    with pytest.raises(ValueError, match="Flate"):
        pdf.extract_text(
            b"%PDF-1.4\n<< /Filter /FlateDecode /Length 4 >>\nstream\nXXXX"
            b"\nendstream"
        )


def test_image_streams_skipped():
    body = (b"%PDF-1.4\n<< /Filter /DCTDecode /Length 4 >>\nstream\n\xff\xd8cd"
            b"\nendstream\n<< /Length 20 >>\nstream\nBT (ok) Tj ET\nendstream")
    assert pdf.extract_text(body) == "ok"


def test_distributed_extraction(spark):
    from graph_db_clustering_spark.operators import text as text_ops

    rows = [
        (i, bytearray(pdf.encode([[f"document {i} body"]])))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r.doc_id: r.text
        for r in text_ops.extract_pdf_text(df, "doc_id", "content").collect()
    }
    assert got == {i: f"document {i} body" for i in range(8)}


def test_extract_document_routes_by_magic(spark):
    from graph_db_clustering_spark.operators import text as text_ops

    rows = [
        (1, bytearray(pdf.encode([["pdf body"]]))),
        (2, bytearray(b"<html><body><p>html body</p></body></html>")),
        (3, bytearray("plain body".encode())),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r.doc_id: (r.format, r.text)
        for r in text_ops.extract_document(df, "doc_id", "content").collect()
    }
    assert got == {
        1: ("pdf", "pdf body"),
        2: ("html", "html body"),
        3: ("text", "plain body"),
    }


def test_extract_document_survives_bad_pdfs(spark):
    """One encrypted/corrupt PDF must not kill the job: the row comes
    back as pdf-error with empty text, the rest extract normally."""
    from graph_db_clustering_spark.operators import text as text_ops

    rows = [
        (1, bytearray(pdf.encode([["good doc"]]))),
        (2, bytearray(b"%PDF-1.4\ntrailer\n<< /Encrypt 5 0 R >>")),
        (3, bytearray(b"%PDF-1.4\n<< /Filter /FlateDecode /Length 4 >>"
                      b"\nstream\nXXXX\nendstream")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r.doc_id: (r.format, r.text)
        for r in text_ops.extract_document(df, "doc_id", "content").collect()
    }
    assert got[1] == ("pdf", "good doc")
    assert got[2] == ("pdf-error", "")
    assert got[3] == ("pdf-error", "")


def test_flate_stream_with_newline_tail_byte():
    """A compressed stream whose LAST byte is 0x0A must survive (the
    rstrip bug corrupted ~0.8% of Flate PDFs before /Length trimming)."""
    import zlib

    line = None
    for i in range(60000):
        cand = f"doc {i} body text"
        if zlib.compress(
            f"BT /F1 12 Tf 72 760 Td 14 TL\n({cand}) Tj\nET".encode()
        )[-1:] in (b"\n", b"\r"):
            line = cand
            break
    assert line is not None
    assert pdf.extract_text(pdf.encode([[line]])) == line


def test_hex_string_literals():
    body = (b"%PDF-1.4\n<< /Length 64 >>\nstream\n"
            b"BT <48656C6C 6F> Tj T* [(a) <2062> (c)] TJ T* <41> Tj ET"
            b"\nendstream")
    # odd-digit hex pads a trailing zero: <41> -> 'A'; <2062> -> ' b'
    assert pdf.extract_text(body) == "Hello\na bc\nA"


# --- CID / Type0 / ToUnicode (round 7) --------------------------------------


def test_cid_roundtrip_unicode():
    """Identity-H Type0 + generated subset ToUnicode CMap: codes are
    sequential subset indexes, so extraction passing proves the CMap
    is applied — and non-Latin text (incl. an astral-plane char, a
    UTF-16 surrogate pair in the CMap dst) survives exactly."""
    pages = [["héllo wörld", "日本語テキスト 🚀", "plain ascii"],
             ["второй страницы"]]
    want = "\n".join("\n".join(p) for p in pages)
    for flate in (True, False):
        assert pdf.extract_text(pdf.encode(pages, flate=flate, cid=True)) == want


def test_cid_bfrange_forms():
    """Both bfrange forms decode: <lo> <hi> <dstStart> increments, and
    the [<dst> ...] array form maps per entry."""
    cmap = (b"2 beginbfrange\n"
            b"<0001> <0003> <0041>\n"
            b"<0010> <0011> [<00E9> <D83DDE80>]\n"  # surrogate pair\n           
            b"endbfrange")
    doc = (b"%PDF-1.4\n"
           b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
           + cmap + b"\nendstream\n"
           b"<< /Length 40 >>\nstream\n"
           b"BT <000100020003> Tj T* <00100011> Tj ET\nendstream\n"
           b"trailer\n<< /Size 2 /Root 1 0 R >>")
    got = pdf.extract_text(doc)
    assert got == "ABC\né\U0001F680"


def test_cid_unmapped_code_is_replacement_char():
    cmap = b"1 beginbfchar\n<0001> <0041>\nendbfchar"
    doc = (b"%PDF-1.4\n"
           b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
           + cmap + b"\nendstream\n"
           b"<< /Length 19 >>\nstream\nBT <00010099> Tj ET\nendstream\n"
           b"trailer\n<< /Size 2 /Root 1 0 R >>")
    assert pdf.extract_text(doc) == "A�"


def test_hex_without_cmap_stays_latin1():
    doc = (b"%PDF-1.4\n<< /Length 20 >>\nstream\nBT <414243> Tj ET"
           b"\nendstream\ntrailer\n<< /Size 2 /Root 1 0 R >>")
    assert pdf.extract_text(doc) == "ABC"


# --- standard security handler (round 7) ------------------------------------


@pytest.mark.parametrize("bits", [40, 128])
@pytest.mark.parametrize("cid", [False, True])
def test_encrypted_roundtrip(bits, cid):
    """RC4 revision 2 (40-bit) and 3 (128-bit) with empty user+owner
    passwords decrypt transparently — key derivation (algorithm 2),
    /O (3), /U (4/5), and per-object stream keys all exercised; the
    CID variant proves the ToUnicode CMap stream decrypts too."""
    pages = [["secret line one", "ligne deux"], ["page two"]]
    blob = pdf.encode(pages, cid=cid, encrypt=bits)
    assert b"secret" not in blob  # the text really is encrypted
    assert pdf.extract_text(blob) == "\n".join("\n".join(p) for p in pages)


def test_encrypted_wrong_password_and_aes_gate():
    blob = bytearray(pdf.encode([["x"]], encrypt=128))
    i = blob.find(b"/U <")
    blob[i + 4 : i + 8] = b"0000"
    with pytest.raises(ValueError, match="password-protected"):
        pdf.extract_text(bytes(blob))
    aes = pdf.encode([["x"]], encrypt=128).replace(b"/V 2 /R 3", b"/V 4 /R 4")
    with pytest.raises(NotImplementedError, match="not supported"):
        pdf.extract_text(aes)


def test_lzw_stream_decodes():
    """PDF LZWDecode = the TIFF early-change LZW the image path already
    implements (round 7: the gate drops; only predictors stay gated)."""
    from graph_db_clustering_spark.functions.simple_images import (
        _lzw_tiff_encode,
    )

    body = _lzw_tiff_encode(b"BT (lzw text works) Tj ET")
    doc = (b"%PDF-1.4\n<< /Filter /LZWDecode /Length "
           + str(len(body)).encode() + b" >>\nstream\n" + body
           + b"\nendstream\ntrailer\n<< /Size 2 /Root 1 0 R >>")
    assert pdf.extract_text(doc) == "lzw text works"


@pytest.mark.parametrize("cid", [False, True])
def test_aesv2_encrypted_roundtrip(cid):
    """V4/R4 AESV2 crypt-filter documents decrypt (round 7): the MD5
    sAlT object keys, IV-prefixed CBC stream bodies, PKCS#7 padding,
    and the /Length restamp (declared length covers IV+padding) all
    exercised; AESV3/R6 stays gated."""
    pages = [["aes secret line", "deuxième"], ["page two"]]
    blob = pdf.encode(pages, cid=cid, encrypt="aes128")
    assert b"aes secret" not in blob
    assert pdf.extract_text(blob) == "\n".join("\n".join(p) for p in pages)
    gated = pdf.encode(pages, encrypt="aes128").replace(
        b"/V 4 /R 4", b"/V 5 /R 6"
    )
    with pytest.raises(NotImplementedError, match="not supported"):
        pdf.extract_text(gated)


@pytest.mark.parametrize("cid", [False, True])
def test_aesv3_r6_encrypted_roundtrip(cid):
    """V5/R6 AESV3: the SHA-2 iterated KDF (algorithm 2.B) validates
    the empty user password against /U's validation salt, unwraps the
    file key from /UE with AES-256-CBC-NoPad, and streams decrypt with
    the file key directly. Self-consistency caveat documented in the
    module: a 2.B drift fails LOUDLY at the /U check (password
    rejection), never as silent garbage."""
    pages = [["r6 secret line", "deuxième"], ["page two"]]
    blob = pdf.encode(pages, cid=cid, encrypt="aes256")
    assert b"r6 secret" not in blob
    assert pdf.extract_text(blob) == "\n".join("\n".join(p) for p in pages)


def test_aesv3_password_rejection():
    blob = bytearray(pdf.encode([["x"]], encrypt="aes256"))
    i = blob.find(b"/U <")
    blob[i + 4 : i + 8] = b"0000"
    with pytest.raises(ValueError, match="password-protected"):
        pdf.extract_text(bytes(blob))


def test_lzw_and_flate_predictors_roundtrip():
    """Round 10: /Predictor 2 (TIFF differencing) and 10-15 (PNG row
    filters) undo after LZW or Flate decompression. Fixtures are built
    by FORWARD-filtering a known text stream with the real predictor
    math, so a decoder slip cannot self-cancel."""
    import zlib

    import numpy as np

    from graph_db_clustering_spark.functions.simple_images import (
        _lzw_tiff_encode,
    )

    text = b"BT (predicted text) Tj ET" + b" " * 7  # pad to rows
    cols = 8
    height = len(text) // cols
    arr = np.frombuffer(text, dtype=np.uint8).reshape(height, cols)

    # PNG Up filter (type 2): row - prev_row, filter byte 2 per row
    png_rows = []
    prev = np.zeros(cols, dtype=np.int16)
    for y in range(height):
        png_rows.append(bytes([2]) + ((arr[y].astype(np.int16) - prev) % 256)
                        .astype(np.uint8).tobytes())
        prev = arr[y].astype(np.int16)
    png_body = b"".join(png_rows)
    for filt, comp in ((b"/FlateDecode", zlib.compress(png_body)),
                       (b"/LZWDecode", _lzw_tiff_encode(png_body))):
        doc = (b"%PDF-1.4\n<< /Filter " + filt +
               b" /Predictor 12 /Columns 8 /Length " +
               str(len(comp)).encode() + b" >>\nstream\n" + comp +
               b"\nendstream")
        assert pdf.extract_text(doc) == "predicted text"

    # TIFF predictor 2: horizontal differencing per row
    diff = arr.astype(np.int16).copy()
    diff[:, 1:] = (arr[:, 1:].astype(np.int16) - arr[:, :-1]) % 256
    tiff_body = diff.astype(np.uint8).tobytes()
    comp = zlib.compress(tiff_body)
    doc = (b"%PDF-1.4\n<< /Filter /FlateDecode /Predictor 2 /Columns 8"
           b" /Length " + str(len(comp)).encode() + b" >>\nstream\n" +
           comp + b"\nendstream")
    assert pdf.extract_text(doc) == "predicted text"

    # multi-component PNG Sub (type 1) with Colors 2 (bpp 2)
    colors, cols2 = 2, 4
    arr2 = np.frombuffer(text, dtype=np.uint8).reshape(height, cols2 * colors)
    rows = []
    for y in range(height):
        line = arr2[y].astype(np.int16)
        out = line.copy()
        out[colors:] = (line[colors:] - line[:-colors]) % 256
        rows.append(bytes([1]) + out.astype(np.uint8).tobytes())
    comp = zlib.compress(b"".join(rows))
    doc = (b"%PDF-1.4\n<< /Filter /FlateDecode /Predictor 12 /Columns 4"
           b" /Colors 2 /Length " + str(len(comp)).encode() +
           b" >>\nstream\n" + comp + b"\nendstream")
    assert pdf.extract_text(doc) == "predicted text"


def test_ascii_and_runlength_filters_and_chains():
    """Round 10: ASCIIHexDecode / ASCII85Decode / RunLengthDecode text
    streams extract (they were silently skipped before), and filter
    CHAINS apply in order ([/ASCII85Decode /FlateDecode]); image
    filters (DCTDecode) still skip."""
    import base64
    import zlib

    text = b"BT (filtered text) Tj ET"
    # ASCIIHex with whitespace and odd-digit padding
    hx = text.hex().encode()
    hx = b" ".join(hx[i:i + 4] for i in range(0, len(hx), 4)) + b">"
    doc = (b"%PDF-1.4\n<< /Filter /ASCIIHexDecode /Length " +
           str(len(hx)).encode() + b" >>\nstream\n" + hx + b"\nendstream")
    assert pdf.extract_text(doc) == "filtered text"
    # ASCII85 with the ~> terminator
    a85 = base64.a85encode(text) + b"~>"
    doc = (b"%PDF-1.4\n<< /Filter /ASCII85Decode /Length " +
           str(len(a85)).encode() + b" >>\nstream\n" + a85 + b"\nendstream")
    assert pdf.extract_text(doc) == "filtered text"
    # RunLength: literal run + repeat run + EOD
    rl = bytes([len(text) - 1]) + text + bytes([257 - 4]) + b" " + b"\x80"
    doc = (b"%PDF-1.4\n<< /Filter /RunLengthDecode /Length " +
           str(len(rl)).encode() + b" >>\nstream\n" + rl + b"\nendstream")
    assert pdf.extract_text(doc) == "filtered text"
    # chain: Flate THEN ASCII85 transport (decode order: A85 -> Flate)
    chained = base64.a85encode(zlib.compress(text)) + b"~>"
    doc = (b"%PDF-1.4\n<< /Filter [/ASCII85Decode /FlateDecode] /Length " +
           str(len(chained)).encode() + b" >>\nstream\n" + chained +
           b"\nendstream")
    assert pdf.extract_text(doc) == "filtered text"
    # image filters still skip silently
    doc = (b"%PDF-1.4\n<< /Filter /DCTDecode /Length 4 >>\nstream\n"
           b"\xff\xd8\xff\xe0\nendstream")
    assert pdf.extract_text(doc) == ""
