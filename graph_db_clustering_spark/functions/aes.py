"""Pure-Python AES-128/192/256 + CBC (FIPS-197), for PDF AESV2/V3.

Unlike the gated entropy-coding tables elsewhere (MP3 Table B.7), AES
needs NO memorized lookup data: the S-box is the multiplicative
inverse in GF(2^8) followed by the documented affine transform, both
computed here at import time, and the round constants are successive
xtime() powers. Correctness is pinned EXTERNALLY by the FIPS-197
Appendix C known-answer vectors in tests (not just self-roundtrip),
so this is verifiable public knowledge, not transcription.

Scope: block encrypt/decrypt + CBC with PKCS#7 padding — what the PDF
standard security handler's AESV2 (AES-128-CBC) and AESV3 (AES-256)
crypt filters need. Performance is irrelevant at fixture/document
scale (a few KB per stream); a production deployment would swap in
`cryptography` via the same seam.
"""

from __future__ import annotations


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse table via exp/log over generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = bytearray(256)
    for a in range(256):
        b = inv(a)
        # affine transform: b ^ rotl(b,1) ^ rotl(b,2) ^ rotl(b,3) ^
        # rotl(b,4) ^ 0x63  (FIPS-197 §5.1.1)
        r = b
        for k in range(1, 5):
            r ^= ((b << k) | (b >> (8 - k))) & 0xFF
        sbox[a] = r ^ 0x63
    inv_sbox = bytearray(256)
    for a, v in enumerate(sbox):
        inv_sbox[v] = a
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()


class AesError(ValueError):
    pass


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise AesError(f"aes: key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [
        [words[4 * r + c] for c in range(4)] for r in range(nr + 1)
    ]


def _add_round_key(state, rk) -> None:
    for c in range(4):
        for r in range(4):
            state[c][r] ^= rk[c][r]


def _mix_single(col, m) -> list[int]:
    return [
        _gmul(col[0], m[r][0]) ^ _gmul(col[1], m[r][1])
        ^ _gmul(col[2], m[r][2]) ^ _gmul(col[3], m[r][3])
        for r in range(4)
    ]


_MIX = [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]]
_INV_MIX = [[14, 11, 13, 9], [9, 14, 11, 13], [13, 9, 14, 11], [11, 13, 9, 14]]


def encrypt_block(key: bytes, block: bytes) -> bytes:
    if len(block) != 16:
        raise AesError("aes: block must be 16 bytes")
    rks = _expand_key(key)
    nr = len(rks) - 1
    state = [list(block[4 * c : 4 * c + 4]) for c in range(4)]
    _add_round_key(state, rks[0])
    for rnd in range(1, nr + 1):
        # SubBytes
        state = [[_SBOX[b] for b in col] for col in state]
        # ShiftRows (row r rotates left by r; state is column-major)
        state = [
            [state[(c + r) % 4][r] for r in range(4)] for c in range(4)
        ]
        if rnd != nr:
            state = [_mix_single(col, _MIX) for col in state]
        _add_round_key(state, rks[rnd])
    return bytes(b for col in state for b in col)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    if len(block) != 16:
        raise AesError("aes: block must be 16 bytes")
    rks = _expand_key(key)
    nr = len(rks) - 1
    state = [list(block[4 * c : 4 * c + 4]) for c in range(4)]
    _add_round_key(state, rks[nr])
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows (row r rotates right by r)
        state = [
            [state[(c - r) % 4][r] for r in range(4)] for c in range(4)
        ]
        # InvSubBytes
        state = [[_INV_SBOX[b] for b in col] for col in state]
        _add_round_key(state, rks[rnd])
        if rnd != 0:
            state = [_mix_single(col, _INV_MIX) for col in state]
    return bytes(b for col in state for b in col)


def cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """AES-CBC with PKCS#7 padding; returns ciphertext WITHOUT the IV
    (callers decide how the IV travels — PDF prepends it)."""
    if len(iv) != 16:
        raise AesError("aes: IV must be 16 bytes")
    pad = 16 - (len(plain) % 16)
    plain = plain + bytes([pad]) * pad
    out = bytearray()
    prev = iv
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        prev = encrypt_block(key, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, cipher: bytes) -> bytes:
    if len(iv) != 16 or len(cipher) % 16:
        raise AesError("aes: CBC ciphertext must be 16-byte aligned")
    out = bytearray()
    prev = iv
    for i in range(0, len(cipher), 16):
        blk = cipher[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, blk), prev))
        prev = blk
    if not out:
        return b""
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise AesError("aes: bad PKCS#7 padding (wrong key or corrupt data)")
    return bytes(out[:-pad])
