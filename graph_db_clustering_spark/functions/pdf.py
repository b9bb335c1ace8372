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
U+FFFD. Round 7 also decrypts standard-security-handler PDFs with
an empty user password (RC4 revision 2/3, the owner-restricted
profile — see the handler section below); genuinely
password-protected files raise ValueError; V4/AESV2 crypt-filter
documents decrypt through the pure-Python FIPS-197 AES
(functions/aes, known-answer pinned) with the sAlT object keys and
IV-prefixed CBC bodies; V5/AESV3 revision 6 decrypts too — the
SHA-2 iterated KDF (algorithm 2.B) validates the empty user
password against /U and unwraps the file key from /UE, with the
safe failure property that any KDF drift rejects the password
loudly instead of decoding garbage; LZWDecode streams decode via
the TIFF
early-change LZW decoder (only LZW-with-predictor stays gated). For
the remaining gates, a real
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


# --- standard security handler (RC4, empty user password) -------------------
#
# The PDF 1.7 §7.6.3 standard security handler with revision 2 (40-bit)
# or 3 (128-bit) RC4 — the "owner-restricted but readable" profile that
# covers most encrypted PDFs in the wild (print/copy restrictions, no
# user password). The famous 32-byte padding constant and the MD5/RC4
# key-derivation algorithms 2-5 are spec text; the /U entry check
# verifies the empty user password, so a genuinely password-protected
# file still raises ValueError, and AESV2+/crypt-filter revisions stay
# gated with NotImplementedError.

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_pwd(pwd: bytes) -> bytes:
    return (pwd + _PAD)[:32]


def _file_key(
    user_pwd: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    keylen: int,
    encrypt_metadata: bool = True,
) -> bytes:
    import hashlib
    import struct as _struct

    seed = _pad_pwd(user_pwd) + o[:32] + _struct.pack("<i", p) + id0
    if r >= 4 and not encrypt_metadata:
        seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    return h[:keylen]


def _owner_entry(owner_pwd: bytes, user_pwd: bytes, r: int, keylen: int) -> bytes:
    import hashlib

    h = hashlib.md5(_pad_pwd(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4key = h[:keylen]
    o = _rc4(rc4key, _pad_pwd(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _user_entry(key: bytes, id0: bytes, r: int) -> bytes:
    import hashlib

    if r == 2:
        return _rc4(key, _PAD)
    u = _rc4(key, hashlib.md5(_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def _object_key(key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    import hashlib

    ext = key + bytes(
        [num & 0xFF, (num >> 8) & 0xFF, (num >> 16) & 0xFF,
         gen & 0xFF, (gen >> 8) & 0xFF]
    )
    if aes:
        ext += b"sAlT"  # the AESV2 salt (PDF 32000 algorithm 1, step b)
    return hashlib.md5(ext).digest()[: min(len(key) + 5, 16)]


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 algorithm 2.B (the R6 iterated KDF): SHA-256 seed,
    then rounds of AES-128-CBC over 64 copies of (pwd + K + udata) with
    the digest choosing SHA-256/384/512, until round >= 64 and the last
    cipher byte <= round - 32. Wrong-implementation failure mode is
    LOUD: the /U validation below simply rejects the password."""
    import hashlib

    from graph_db_clustering_spark.functions import aes as _aes

    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        # AES-128-CBC, no padding, key/iv from K
        prev = k[16:32]
        e = bytearray()
        key = k[:16]
        for i in range(0, len(k1), 16):
            blk = bytes(a ^ b for a, b in zip(k1[i : i + 16], prev))
            prev = _aes.encrypt_block(key, blk)
            e += prev
        e = bytes(e)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def _r6_file_key(u: bytes, ue: bytes) -> bytes:
    """R6 empty-user-password flow: validate against /U (48 bytes =
    hash(32) + validation salt(8) + key salt(8)), then unwrap the file
    key from /UE with AES-256-CBC-NoPad."""
    from graph_db_clustering_spark.functions import aes as _aes

    if len(u) < 48 or len(ue) != 32:
        raise ValueError("PDF R6: malformed /U or /UE entry")
    vsalt, ksalt = u[32:40], u[40:48]
    if _hash_2b(b"", vsalt) != u[:32]:
        raise ValueError(
            "PDF is password-protected (empty user password rejected)"
        )
    ikey = _hash_2b(b"", ksalt)
    # AES-256-CBC decrypt with zero IV, NO padding
    prev = b"\x00" * 16
    out = bytearray()
    for i in range(0, 32, 16):
        blk = ue[i : i + 16]
        out += bytes(
            a ^ b for a, b in zip(_aes.decrypt_block(ikey, blk), prev)
        )
        prev = blk
    return bytes(out)


def _pdf_string_bytes(tok: bytes) -> bytes:
    """A PDF string token (literal or hex) -> raw bytes."""
    if tok[:1] == b"<":
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    return _unescape(tok[1:-1])


def _decrypt_pdf(data: bytes, trailer: bytes) -> bytes:
    """Standard-security-handler decrypt (empty user password) -> a
    plaintext copy of the document with the /Encrypt marker removed."""
    em = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", trailer)
    if not em:
        raise ValueError("PDF /Encrypt entry is not an indirect reference")
    enc_num = int(em.group(1))
    om = re.search(
        # two dict-nesting levels (the V4 /CF << /StdCF << .. >> >> form)
        # plus hex-string members
        rb"\b%d\s+%d\s+obj\s*"
        rb"<<((?:[^<>]|<[0-9A-Fa-f\s]*>|<<(?:[^<>]|<[0-9A-Fa-f\s]*>|<<[^<>]*>>)*>>)*)>>"
        % (enc_num, int(em.group(2))),
        data,
    )
    if not om:
        raise ValueError("PDF /Encrypt dictionary object not found")
    ed = om.group(1)
    if b"/Standard" not in ed:
        raise NotImplementedError("PDF: only the Standard security handler")
    v = int((re.search(rb"/V\s+(\d+)", ed) or [None, b"0"])[1])
    r = int((re.search(rb"/R\s+(\d+)", ed) or [None, b"2"])[1])
    aes_mode = False
    r6_mode = False
    if v == 5 and r in (5, 6):
        if b"/AESV3" not in ed:
            raise NotImplementedError(
                "PDF: V=5 crypt filter other than AESV3 not supported"
            )
        aes_mode = r6_mode = True
    elif v == 4 and r == 4:
        # crypt filters: only the standard StdCF/AESV2 stream filter
        # profile decodes (what Acrobat 7+ writes); V2-CFM = plain RC4
        if b"/AESV2" in ed:
            aes_mode = True
        elif b"/V2" not in ed:
            raise NotImplementedError(
                "PDF: V=4 crypt filter other than AESV2/V2 not supported"
            )
    elif v not in (1, 2) or r not in (2, 3):
        raise NotImplementedError(
            f"PDF: encryption V={v}/R={r} not supported (RC4 V1/V2 and "
            "V4 AESV2 only — AESV3/R6 needs the SHA-2 handler)"
        )
    bits = int((re.search(rb"/Length\s+(\d+)", ed) or [None, b"40"])[1])
    keylen = bits // 8
    pm = re.search(rb"/P\s+(-?\d+)", ed)
    osm = re.search(rb"/O\s*(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]+>)", ed)
    usm = re.search(rb"/U\s*(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]+>)", ed)
    if not (pm and osm and usm):
        raise ValueError("PDF /Encrypt dictionary missing O/U/P")
    idm = re.search(
        rb"/ID\s*\[\s*(<[0-9A-Fa-f\s]*>|\((?:\\.|[^\\()])*\))", trailer
    )
    id0 = _pdf_string_bytes(idm.group(1)) if idm else b""
    o = _pdf_string_bytes(osm.group(1))
    u = _pdf_string_bytes(usm.group(1))
    if r6_mode:
        uem = re.search(
            rb"/UE\s*(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]+>)", ed
        )
        if not uem:
            raise ValueError("PDF R6: /UE entry missing")
        key = _r6_file_key(u, _pdf_string_bytes(uem.group(1)))
    else:
        no_meta = re.search(rb"/EncryptMetadata\s+false", ed) is not None
        key = _file_key(
            b"", o, int(pm.group(1)), id0, r, keylen,
            encrypt_metadata=not no_meta,
        )
        want_u = _user_entry(key, id0, r)
        cmp_len = 32 if r == 2 else 16
        if want_u[:cmp_len] != u[:cmp_len]:
            raise ValueError(
                "PDF is password-protected (empty user password rejected)"
            )

    def decrypt_obj(m: re.Match) -> bytes:
        num, gen, body = int(m.group(1)), int(m.group(2)), m.group(3)
        if num == enc_num:
            return m.group(0)  # the Encrypt dict itself is never encrypted
        sm = re.search(rb"stream\r?\n(.*?)(\r?\nendstream|endstream)", body, re.S)
        if not sm:
            return m.group(0)
        # V5 streams use the FILE key directly; V4/AESV2 derives per
        # object with the sAlT extension
        okey = key if r6_mode else _object_key(key, num, gen, aes=aes_mode)
        raw = sm.group(1)
        if aes_mode:
            from graph_db_clustering_spark.functions import aes as _aes

            if len(raw) < 16:
                raise ValueError("PDF: AES stream shorter than its IV")
            try:
                plain = _aes.cbc_decrypt(okey, raw[:16], raw[16:])
            except _aes.AesError as e:
                raise ValueError(f"PDF: corrupt AES stream ({e})")
        else:
            plain = _rc4(okey, raw)
        new_body = body[: sm.start(1)] + plain + body[sm.end(1):]
        if aes_mode:
            # the declared /Length is the ENCRYPTED length (IV+padding);
            # restamp it so downstream trimming keeps the plain body
            new_body = re.sub(
                rb"/Length\s+\d+",
                b"/Length %d" % len(plain),
                new_body,
                count=1,
            )
        return b"%d %d obj" % (num, gen) + new_body + b"endobj"

    out = re.sub(
        rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", decrypt_obj, data, flags=re.S
    )
    # drop the marker so the re-entrant extract pass treats it as plain
    return out.replace(b"/Encrypt %d %d R" % (enc_num, int(em.group(2))), b"")


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _run_filters(body: bytes, head: bytes) -> bytes | None:
    """Apply the stream's /Filter pipeline in order (single name or
    array): the ASCII transports (ASCIIHexDecode, ASCII85Decode — a
    round-10 fix: these TEXT streams were silently skipped before),
    RunLengthDecode, FlateDecode and LZWDecode (each followed by the
    /Predictor undo; PDF LZW is TIFF's early-change variant). Returns
    None for pipelines containing image/unknown filters (DCTDecode,
    CCITT, JBIG2...) — those streams carry no text operators."""
    m = _FILTER_RE.search(head)
    if not m:
        return body
    names = re.findall(rb"/([A-Za-z0-9]+)", m.group(1))
    for f in names:
        if f in (b"ASCIIHexDecode", b"AHx"):
            data = body.split(b">", 1)[0]
            hx = re.sub(rb"\s", b"", data)
            if len(hx) % 2:
                hx += b"0"  # odd digit count pads a zero, per spec
            try:
                body = bytes.fromhex(hx.decode("ascii"))
            except (ValueError, UnicodeDecodeError) as e:
                raise ValueError(f"PDF: corrupt ASCIIHex stream ({e})")
        elif f in (b"ASCII85Decode", b"A85"):
            import base64

            data = re.sub(rb"\s", b"", body)
            if data.startswith(b"<~"):
                data = data[2:]
            if data.endswith(b"~>"):
                data = data[:-2]
            try:
                body = base64.a85decode(data, adobe=False)
            except ValueError as e:
                raise ValueError(f"PDF: corrupt ASCII85 stream ({e})")
        elif f in (b"RunLengthDecode", b"RL"):
            out, i = bytearray(), 0
            while i < len(body):
                n = body[i]
                if n == 128:
                    break  # EOD
                if n < 128:
                    out += body[i + 1: i + 2 + n]
                    i += 2 + n
                else:
                    out += body[i + 1: i + 2] * (257 - n)
                    i += 2
            body = bytes(out)
        elif f in (b"FlateDecode", b"Fl"):
            try:
                body = zlib.decompress(body)
            except zlib.error as e:
                raise ValueError(f"PDF: corrupt Flate stream ({e!r})")
            body = _apply_predictor(body, head)
        elif f in (b"LZWDecode", b"LZW"):
            from graph_db_clustering_spark.functions.simple_images import (
                _lzw_tiff_decode,
            )

            try:
                body = _lzw_tiff_decode(body)
            except ValueError as e:
                raise ValueError(f"PDF: corrupt LZW stream ({e})")
            body = _apply_predictor(body, head)
        else:
            return None  # image/unknown filter: no text to extract
    return body


def _apply_predictor(body: bytes, head: bytes) -> bytes:
    """Undo a stream dictionary's /Predictor (PDF 32000 §7.4.4.4):
    1 = none, 2 = TIFF horizontal differencing, 10-15 = the PNG row
    filters (each row prefixed by its filter-type byte; 10-15 all
    decode identically because the byte, not the dict value, names the
    per-row filter — the PNG machinery in functions/png is reused
    verbatim). /Colors, /BitsPerComponent, /Columns default 1/8/1."""
    pm = re.search(rb"/Predictor\s+(\d+)", head)
    pred = int(pm.group(1)) if pm else 1
    if pred == 1:
        return body
    import numpy as np

    def _param(name, default):
        m = re.search(rb"/" + name + rb"\s+(\d+)", head)
        return int(m.group(1)) if m else default

    colors = _param(b"Colors", 1)
    bpc = _param(b"BitsPerComponent", 8)
    cols = _param(b"Columns", 1)
    stride = (colors * bpc * cols + 7) // 8
    bpp = max(1, (colors * bpc) // 8)
    if pred == 2:
        if bpc != 8:
            raise NotImplementedError(
                f"PDF: TIFF predictor with BitsPerComponent {bpc}"
            )
        height = len(body) // stride
        arr = np.frombuffer(
            body[: height * stride], dtype=np.uint8
        ).reshape(height, cols, colors).astype(np.int64)
        out = (np.cumsum(arr, axis=1) % 256).astype(np.uint8)
        return out.tobytes() + body[height * stride :]
    if 10 <= pred <= 15:
        from graph_db_clustering_spark.functions.png import _unfilter

        height = len(body) // (stride + 1)
        if height * (stride + 1) != len(body):
            raise ValueError(
                "PDF: predictor stream length not a whole number of rows"
            )
        raw = np.frombuffer(body, dtype=np.uint8)
        return _unfilter(raw, height, stride, bpp).tobytes()
    raise ValueError(f"PDF: unknown predictor {pred}")


def extract_text(data: bytes) -> str:
    """PDF bytes -> extracted text (one line per Td/TD/T* break)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (%PDF- header missing)")
    # /Encrypt is meaningful only inside the TRAILER dictionary — a
    # content stream mentioning the literal string must not be rejected
    tm = None
    for tm in re.finditer(rb"trailer\s*<<((?:[^<>]|<<[^<>]*>>|<[0-9A-Fa-f\s]*>)*)>>", data):
        pass  # keep the LAST trailer (incremental updates)
    if tm is not None and b"/Encrypt" in tm.group(1):
        data = _decrypt_pdf(data, tm.group(1))
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
        body = _run_filters(body, head)
        if body is None:
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
    pages: list[list[str]],
    flate: bool = True,
    cid: bool = False,
    encrypt: int | None = None,
) -> bytes:
    """pages = list of pages, each a list of text lines -> PDF bytes.

    ``cid=True`` emits an Identity-H Type0 font with a generated subset
    ToUnicode CMap and hex-CID text: codes are sequential subset
    indexes (NOT character values), so extract_text must actually apply
    the CMap to invert — and any unicode text becomes representable.

    ``encrypt=40|128`` applies the standard security handler (RC4,
    revision 2/3, empty user AND owner password) — the fixture side of
    the decrypt path, exercising key derivation, the /O and /U entries,
    and per-object stream encryption."""
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

    extra_trailer = b""
    if encrypt is not None:
        aes_mode = encrypt == "aes128"
        r6_mode = encrypt == "aes256"
        if not (aes_mode or r6_mode) and encrypt not in (40, 128):
            raise ValueError(
                "encrypt must be 40, 128 (RC4 key bits), 'aes128' or "
                "'aes256'"
            )
        bits = 256 if r6_mode else 128 if aes_mode else encrypt
        keylen = bits // 8
        if r6_mode:
            r, v = 6, 5
        elif aes_mode:
            r, v = 4, 4
        else:
            r, v = (2, 1) if encrypt == 40 else (3, 2)
        id0 = b"gdc-fixture-id-0"
        p = -4
        if r6_mode:
            import hashlib as _hl

            from graph_db_clustering_spark.functions import aes as _aes

            key = _hl.sha256(b"gdc-r6-file-key").digest()  # fixture key
            vsalt = b"vsalt-00"
            ksalt = b"ksalt-00"
            u = _hash_2b(b"", vsalt) + vsalt + ksalt
            ikey = _hash_2b(b"", ksalt)
            prev = b"\x00" * 16
            ue = bytearray()
            for i in range(0, 32, 16):
                blk = bytes(
                    a ^ b for a, b in zip(key[i : i + 16], prev)
                )
                prev = _aes.encrypt_block(ikey, blk)
                ue += prev
            ue = bytes(ue)
            # owner entries mirror the user ones with /U as udata
            ovs, oks = b"Ovsalt-0", b"Oksalt-0"
            o = _hash_2b(b"", ovs, u) + ovs + oks
            oe_key = _hash_2b(b"", oks, u)
            prev = b"\x00" * 16
            oe = bytearray()
            for i in range(0, 32, 16):
                blk = bytes(a ^ b for a, b in zip(key[i : i + 16], prev))
                prev = _aes.encrypt_block(oe_key, blk)
                oe += prev
            oe = bytes(oe)
        else:
            o = _owner_entry(b"", b"", r, keylen)
            key = _file_key(b"", o, p, id0, r, keylen)
            u = _user_entry(key, id0, r)
        srch = re.compile(rb"stream\n(.*?)\nendstream", re.S)
        for idx in range(len(objects)):
            sm = srch.search(objects[idx])
            if not sm:
                continue
            okey = (
                key if r6_mode
                else _object_key(key, idx + 1, 0, aes=aes_mode)
            )
            if aes_mode or r6_mode:
                import hashlib as _hl

                from graph_db_clustering_spark.functions import aes as _aes

                iv = _hl.md5(b"gdc-iv-%d" % (idx + 1)).digest()
                cipher = iv + _aes.cbc_encrypt(okey, iv, sm.group(1))
            else:
                cipher = _rc4(okey, sm.group(1))
            body = (
                objects[idx][: sm.start(1)]
                + cipher
                + objects[idx][sm.end(1):]
            )
            if aes_mode or r6_mode:  # stored /Length covers IV+padding
                body = re.sub(
                    rb"/Length\s+\d+",
                    b"/Length %d" % len(cipher),
                    body,
                    count=1,
                )
            objects[idx] = body
        if r6_mode:
            cf = (
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF "
            )
            extra = b"/UE <%s> /OE <%s> " % (
                ue.hex().encode(), oe.hex().encode(),
            )
        elif aes_mode:
            cf = (
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF "
            )
            extra = b""
        else:
            cf = b""
            extra = b""
        enc_id = add(
            b"<< /Filter /Standard /V %d /R %d /Length %d /P %d %s%s"
            b"/O <%s> /U <%s> >>"
            % (v, r, bits, p, cf, extra, o.hex().encode(), u.hex().encode())
        )
        extra_trailer = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            enc_id, id0.hex().encode(), id0.hex().encode(),
        )

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
        b"trailer\n<< /Size %d /Root %d 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog, extra_trailer, xref_at)
    )
    return bytes(out)
