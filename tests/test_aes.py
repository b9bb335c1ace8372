"""Pure-Python AES (functions/aes) — FIPS-197 known-answer pinned."""

import pytest

from graph_db_clustering_spark.functions import aes


def test_fips197_appendix_c_vectors():
    """The Appendix C example vectors: the EXTERNAL correctness pin
    (not self-roundtrip) — the algorithmically-built S-box, key
    schedule, and round structure must all be right for these to
    match."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key, want in cases:
        ct = aes.encrypt_block(key, pt)
        assert ct.hex() == want, (len(key), ct.hex())
        assert aes.decrypt_block(key, ct) == pt


def test_cbc_roundtrip_and_padding():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    for n in (0, 1, 15, 16, 17, 100):
        msg = bytes(range(256))[:n] * 1
        ct = aes.cbc_encrypt(key, iv, msg)
        assert len(ct) % 16 == 0 and len(ct) >= n + 1
        assert aes.cbc_decrypt(key, iv, ct) == msg


def test_cbc_bad_padding_and_sizes_raise():
    key = bytes(range(16))
    iv = bytes(16)
    ct = aes.cbc_encrypt(key, iv, b"hello world")
    with pytest.raises(aes.AesError, match="padding"):
        aes.cbc_decrypt(bytes(range(1, 17)), iv, ct)  # wrong key
    with pytest.raises(aes.AesError, match="aligned"):
        aes.cbc_decrypt(key, iv, ct[:-3])
    with pytest.raises(aes.AesError, match="key must"):
        aes.encrypt_block(b"short", bytes(16))
