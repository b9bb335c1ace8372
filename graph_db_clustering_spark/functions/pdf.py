"""Minimal PDF text extraction in pure Python (stdlib zlib only).

PDFs are a first-class training-data source; the extraction path here
covers the simple-but-common profile: content streams stored raw or
FlateDecode-compressed, text shown with Tj / TJ / ' operators in
(string) literals using the standard escapes (\\( \\) \\\\ \\n \\r \\t
and octal \\ddd), with Td/TD/T* treated as line breaks. Hex <...> string
literals decode (single-byte Latin-1 interpretation). Out of scope —
documented, not silent: CID/Type0 composite fonts (hex strings under a
CID font decode per-byte, not per-CID), encrypted PDFs (ValueError),
LZW streams (NotImplementedError). For those, a real deployment plugs a full parser
into the same Arrow-batched operator (operators/text.extract_pdf_text);
this module makes the common case REAL end to end and testable.

The writer emits well-formed single/multi-page PDFs (Helvetica, one
content stream per page, optional Flate) for fixtures and the
ground-truth oracle (documents -> PDF -> extract must invert exactly).
"""

from __future__ import annotations

import re
import zlib

# the head dict must not span ACROSS other objects' dicts: [^<>] forbids
# crossing a '>> ... <<' boundary while one nesting level of inner dicts
# (e.g. /Resources << ... >>) stays allowed
_STREAM_RE = re.compile(
    rb"<<((?:[^<>]|<<[^<>]*>>)*)>>\s*stream\r?\n(.*?)endstream", re.S
)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
# text-showing ops: (str) Tj, (str) ', [ ... ] TJ; line-break ops.
# Inside a TJ array, (string) literals are matched ATOMICALLY so a ']'
# inside a string cannot terminate the array early
_TJ_RE = re.compile(
    rb"(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>)\s*(?:Tj|')"
    rb"|\[(?:\\.|\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*?\]\s*TJ"
    rb"|T[dD*]"
)
_LIT_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(lit: bytes) -> bytes:
    """PDF (string) literal body -> raw bytes (standard + octal escapes,
    escaped newlines are line continuations)."""
    out = bytearray()
    i = 0
    n = len(lit)
    while i < n:
        c = lit[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = lit[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt and nxt in b"01234567":
            # octal escapes take OCTAL digits only: \48 is \4 then '8',
            # and \8 (below) drops the backslash per the spec
            j = i + 1
            while j < min(i + 4, n) and lit[j : j + 1] in b"01234567":
                j += 1
            out.append(int(lit[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):
            i += 2  # line continuation
        else:
            out += nxt
            i += 2
    return bytes(out)


def extract_text(data: bytes) -> str:
    """PDF bytes -> extracted text (one line per Td/TD/T* break)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (%PDF- header missing)")
    # /Encrypt is meaningful only inside the TRAILER dictionary — a
    # content stream mentioning the literal string must not be rejected
    tm = None
    for tm in re.finditer(rb"trailer\s*<<((?:[^<>]|<<[^<>]*>>)*)>>", data):
        pass  # keep the LAST trailer (incremental updates)
    if tm is not None and b"/Encrypt" in tm.group(1):
        raise ValueError("PDF is encrypted; extraction needs the decryption key")
    pieces: list[str] = []
    for m in _STREAM_RE.finditer(data):
        head, body = m.group(1), m.group(2)
        # trim to /Length when declared; otherwise strip exactly the ONE
        # EOL before 'endstream' — a blanket rstrip would eat 0x0A/0x0D
        # bytes belonging to the compressed data itself (review finding:
        # ~0.8% of Flate streams end in \n or \r)
        lm = _LENGTH_RE.search(head)
        if lm and int(lm.group(1)) <= len(body):
            body = body[: int(lm.group(1))]
        elif body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n") or body.endswith(b"\r"):
            body = body[:-1]
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body)
            except zlib.error as e:
                raise ValueError(f"PDF: corrupt Flate stream ({e!r})")
        elif b"/LZWDecode" in head:
            raise NotImplementedError("PDF LZWDecode streams not supported")
        elif b"/Filter" in head:
            continue  # image/other filtered streams carry no text ops
        line: list[str] = []
        for op in _TJ_RE.finditer(body):
            tok = op.group(0)
            if tok in (b"Td", b"TD", b"T*") or tok[:1] == b"T":
                if line:
                    pieces.append("".join(line))
                    line = []
                continue
            for lit in _LIT_RE.finditer(tok):
                raw = lit.group(0)
                if raw[:1] == b"<":  # hex string: whitespace allowed,
                    # odd digit count pads a trailing 0 (the spec)
                    hx = re.sub(rb"\s", b"", raw[1:-1])
                    if len(hx) % 2:
                        hx += b"0"
                    line.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
                else:
                    line.append(_unescape(raw[1:-1]).decode("latin-1"))
        if line:
            pieces.append("".join(line))
    return "\n".join(pieces)


# --- writer (fixtures / ground-truth oracle) --------------------------------


def _escape(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1", errors="replace")


def encode(pages: list[list[str]], flate: bool = True) -> bytes:
    """pages = list of pages, each a list of text lines -> PDF bytes."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 760 Td 14 TL"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _escape(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if flate:
            stream = zlib.compress(stream)
            head = b"<< /Filter /FlateDecode /Length %d >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        content_ids.append(
            add(head + b"\nstream\n" + stream + b"\nendstream")
        )
    pages_id = len(objects) + len(pages) + 1  # placed after the page objects
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
                % (pages_id, font, cid)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    got_id = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
    )
    if got_id != pages_id:  # NEVER an assert: python -O must not corrupt output
        raise RuntimeError(f"pdf writer object numbering drifted: {got_id}")
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog, xref_at)
    )
    return bytes(out)
