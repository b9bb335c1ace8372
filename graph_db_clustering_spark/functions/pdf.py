"""Minimal PDF text extraction in pure Python (stdlib zlib only).

PDFs are a first-class training-data source; the extraction path here
covers the simple-but-common profile: content streams stored raw or
FlateDecode-compressed, text shown with Tj / TJ / ' operators in
(string) literals using the standard escapes (\\( \\) \\\\ \\n \\r \\t
and octal \\ddd), with Td/TD/T* treated as line breaks, and — round 7
— CID/Type0 composite fonts via their /ToUnicode CMaps: when the
document embeds CMap streams (beginbfchar / beginbfrange sections,
the layout every subset-embedding writer like Word or Chrome
print-to-PDF emits), hex <...> strings decode as 2-byte CIDs through
the UNION of the document's CMaps (UTF-16BE destinations, multi-unit
targets, range and array bfrange forms); without a CMap, hex strings
keep the single-byte Latin-1 interpretation. Known simplification,
documented: per-string font state (Tf) is not tracked, so multi-font
documents whose CMaps assign CONFLICTING meanings to the same 2-byte
code pick the first-registered mapping; unmapped codes decode to
U+FFFD. Out of scope — documented, not silent: encrypted PDFs
(ValueError), LZW streams (NotImplementedError). For those, a real
deployment plugs a full parser into the same Arrow-batched operator
(operators/text.extract_pdf_text); this module makes the common case
REAL end to end and testable.

The writer emits well-formed single/multi-page PDFs (Helvetica, one
content stream per page, optional Flate) for fixtures and the
ground-truth oracle (documents -> PDF -> extract must invert
exactly); encode(cid=True) emits an Identity-H Type0 font with a
generated subset ToUnicode CMap and hex-CID text — the codes are
sequential subset indexes, NOT character values, so the roundtrip
passing proves the CMap is genuinely applied (and it makes non-Latin
fixture text representable at all)."""

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


_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_RANGE_ITEM_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\])"
)


def _utf16be(hx: bytes) -> str:
    return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be")


def _parse_tounicode(body: bytes, cmap: dict[int, str]) -> None:
    """Merge one ToUnicode CMap stream's bfchar/bfrange sections into
    ``cmap`` (first registration wins on collisions)."""
    for block in _BFCHAR_RE.finditer(body):
        hexes = _HEX_RE.findall(block.group(1))
        for src, dst in zip(hexes[0::2], hexes[1::2]):
            code = int(re.sub(rb"\s", b"", src), 16)
            cmap.setdefault(code, _utf16be(re.sub(rb"\s", b"", dst)))
    for block in _BFRANGE_RE.finditer(body):
        for m in _RANGE_ITEM_RE.finditer(block.group(1)):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            if hi < lo or hi - lo > 0xFFFF:
                raise ValueError("PDF: malformed bfrange bounds")
            if m.group(3) is not None:  # <lo> <hi> <dstStart>
                start = int(m.group(3), 16)
                width = len(m.group(3))
                for i in range(hi - lo + 1):
                    cmap.setdefault(
                        lo + i, _utf16be(b"%0*X" % (width, start + i))
                    )
            else:  # <lo> <hi> [<dst> <dst> ...]
                dsts = _HEX_RE.findall(m.group(4))
                for i, d in enumerate(dsts[: hi - lo + 1]):
                    cmap.setdefault(lo + i, _utf16be(d))


def _collect_cid_maps(data: bytes) -> dict[int, str]:
    """Union of every ToUnicode CMap stream in the document."""
    cmap: dict[int, str] = {}
    for m in _STREAM_RE.finditer(data):
        head, body = m.group(1), m.group(2)
        lm = _LENGTH_RE.search(head)
        if lm and int(lm.group(1)) <= len(body):
            body = body[: int(lm.group(1))]
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue  # a corrupt non-text stream must not kill CMaps
        if b"beginbfchar" in body or b"beginbfrange" in body:
            _parse_tounicode(body, cmap)
    return cmap


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
    cid_map = _collect_cid_maps(data)
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
                    bs = bytes.fromhex(hx.decode("ascii"))
                    if cid_map and len(bs) % 2 == 0:
                        # CID text: 2-byte codes through the ToUnicode
                        # union; unmapped codes -> U+FFFD (the spec's
                        # recommended fallback)
                        line.append(
                            "".join(
                                cid_map.get(
                                    (bs[i] << 8) | bs[i + 1], "�"
                                )
                                for i in range(0, len(bs), 2)
                            )
                        )
                    else:
                        line.append(bs.decode("latin-1"))
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


def _tounicode_cmap(codes: dict[str, int]) -> bytes:
    """Generated subset ToUnicode CMap (the Adobe-Identity-UCS layout
    real subset embedders emit; bfchar blocks capped at 100 entries per
    the CMap spec)."""
    items = sorted(codes.items(), key=lambda kv: kv[1])
    out = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for i in range(0, len(items), 100):
        chunk = items[i : i + 100]
        out.append(b"%d beginbfchar" % len(chunk))
        for ch, code in chunk:
            out.append(
                b"<%04X> <%s>"
                % (code, ch.encode("utf-16-be").hex().upper().encode())
            )
        out.append(b"endbfchar")
    out += [b"endcmap", b"CMapName currentdict /CMap defineresource pop",
            b"end", b"end"]
    return b"\n".join(out)


def encode(
    pages: list[list[str]], flate: bool = True, cid: bool = False
) -> bytes:
    """pages = list of pages, each a list of text lines -> PDF bytes.

    ``cid=True`` emits an Identity-H Type0 font with a generated subset
    ToUnicode CMap and hex-CID text: codes are sequential subset
    indexes (NOT character values), so extract_text must actually apply
    the CMap to invert — and any unicode text becomes representable."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    codes: dict[str, int] = {}
    if cid:
        for lines in pages:
            for line in lines:
                for ch in line:
                    codes.setdefault(ch, len(codes) + 1)
        cmap = _tounicode_cmap(codes)
        if flate:
            cmap_z = zlib.compress(cmap)
            cmap_id = add(
                b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(cmap_z)
                + cmap_z + b"\nendstream"
            )
        else:
            cmap_id = add(
                b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
            )
        font = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Subset-Font "
            b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % cmap_id
        )
    else:
        font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 760 Td 14 TL"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            if cid:
                hx = b"".join(b"%04X" % codes[ch] for ch in line)
                ops.append(b"<" + hx + b"> Tj")
            else:
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
