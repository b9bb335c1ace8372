"""Z85 (ZeroMQ Base85, spec https://rfc.zeromq.org/spec/32/) codec.

The Delta protocol encodes deletion-vector descriptors'
`pathOrInlineDv` with THIS alphabet (delta-io Codec `Base85Codec`),
NOT Python's :func:`base64.b85encode` (RFC 1924 alphabet) — the two
share block math but map digits to different characters, so a
descriptor written by delta-spark decodes to garbage under b85.

Delta's codec relaxes the spec's strict 4-byte alignment the same way
delta-io's `Base85Codec.encodeBytes` does: unaligned input is
zero-padded up to the next 4-byte boundary before encoding, and the
decoder truncates back to the caller-declared output length (the
descriptor's own `sizeInBytes` for inline blobs, 16 for the 'u'
storage UUID tail).
"""

from __future__ import annotations

_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_DECODE = {c: i for i, c in enumerate(_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Encode bytes as Z85; zero-pads unaligned input (Delta-style)."""
    data = bytes(data) + b"\x00" * ((-len(data)) % 4)
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        frame = []
        for _ in range(5):
            n, r = divmod(n, 85)
            frame.append(_ALPHABET[r])
        out.extend(reversed(frame))
    return "".join(out)


def z85_decode(s: str, out_len: int | None = None) -> bytes:
    """Decode a Z85 string; `out_len` truncates zero-padding added by
    :func:`z85_encode` for unaligned payloads."""
    if len(s) % 5:
        raise ValueError("z85: encoded length must be a multiple of 5")
    buf = bytearray()
    for i in range(0, len(s), 5):
        n = 0
        for c in s[i : i + 5]:
            try:
                n = n * 85 + _DECODE[c]
            except KeyError:
                raise ValueError(f"z85: invalid character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError("z85: 5-char frame overflows 32 bits")
        buf += n.to_bytes(4, "big")
    if out_len is not None:
        if not (out_len <= len(buf) <= out_len + 3):
            raise ValueError(
                f"z85: decoded {len(buf)} bytes, expected {out_len} "
                "(+<=3 bytes padding)"
            )
        return bytes(buf[:out_len])
    return bytes(buf)
