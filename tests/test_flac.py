"""FLAC codec tests: byte-exact roundtrips through every subframe type,
stereo decorrelation mode, and Rice coding variant; corrupt-input gates
(CRC-8, CRC-16, MD5, truncation); dispatch parity with the WAV path
(lossless means identical features)."""

import numpy as np
import pytest

from graph_db_clustering_spark.functions import flac


def _sig(n=2000, seed=7, amp=2000):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 23.0)).astype(np.int64) + rng.randint(-4, 5, n)


def test_mono_roundtrip_fixed_predictors():
    x = _sig()
    blob = flac.encode(x, rate=16000, bps=16, block_size=512)
    info, pcm = flac.decode_pcm(blob)
    assert (info["rate"], info["channels"], info["bps"]) == (16000, 1, 16)
    assert np.array_equal(pcm[:, 0], x)
    # compression actually happened (fixed predictor + rice beat raw)
    assert len(blob) < 2 * len(x)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_roundtrip(mode):
    x = _sig()
    rng = np.random.RandomState(11)
    st = np.stack(
        [x, (x * 0.7).astype(np.int64) + rng.randint(-3, 4, len(x))], axis=1
    )
    blob = flac.encode(st, rate=44100, bps=16, block_size=577, stereo_mode=mode)
    _, pcm = flac.decode_pcm(blob)
    assert np.array_equal(pcm, st), mode


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths_roundtrip(bps):
    amp = (1 << (bps - 2)) - 1
    x = (_sig(500, amp=1) * amp // 2000).astype(np.int64)
    x = np.clip(x, -(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    blob = flac.encode(x, bps=bps, block_size=200)
    assert np.array_equal(flac.decode_pcm(blob)[1][:, 0], x)


def test_constant_verbatim_lpc_and_rice_variants():
    x = _sig(1024)
    # constant
    blob = flac.encode(np.full(300, -5, np.int64), bps=16, block_size=100)
    assert np.array_equal(flac.decode_pcm(blob)[1][:, 0], np.full(300, -5))
    # verbatim (forced), LPC (forced), partitioned rice, escape coding
    for kw in (
        dict(subframe="verbatim"),
        dict(subframe="lpc"),
        dict(rice_po=2),
        dict(rice_escape_bits=14),
        dict(subframe="lpc", rice_po=3),
    ):
        blob = flac.encode(x, bps=16, block_size=256, **kw)
        assert np.array_equal(flac.decode_pcm(blob)[1][:, 0], x), kw


def test_many_frames_multibyte_frame_numbers():
    # >127 frames forces the multi-byte UTF-8-style frame number path
    x = _sig(3000)
    blob = flac.encode(x, bps=16, block_size=16)
    assert np.array_equal(flac.decode_pcm(blob)[1][:, 0], x)


def test_wasted_bits_subframe_decodes():
    """Hand-built frame with a wasted-bits CONSTANT subframe: value
    coded in bps-1 bits, reconstructed <<1."""
    bw = flac._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)   # 16-bit blocksize at end
    bw.write(0, 4)   # rate from STREAMINFO
    bw.write(0, 4)   # mono
    bw.write(0, 4)   # size from STREAMINFO + reserved bit
    bw.write(0, 8)   # frame number 0
    bw.write(7, 16)  # blocksize 8
    hdr = bytes(bw.buf)
    bw.write(flac._crc8(hdr), 8)
    bw.write(0, 1)
    bw.write(0, 6)   # CONSTANT
    bw.write(1, 1)   # wasted-bits flag
    bw.write(1, 1)   # unary 0 -> wasted = 1
    bw.write(21, 15)  # value in eff = 16-1 bits
    bw.align()
    body = bytes(bw.buf)
    bw.write(flac._crc16(body), 16)
    si = bytearray(34)
    si[10] = (8000 >> 12) & 0xFF
    si[11] = (8000 >> 4) & 0xFF
    si[12] = ((8000 & 0xF) << 4) | (0 << 1) | ((16 - 1) >> 4)
    si[13] = (((16 - 1) & 0xF) << 4)
    si[14:18] = (8).to_bytes(4, "big")
    blob = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si) + bw.bytes()
    info, pcm = flac.decode_pcm(blob)
    assert np.array_equal(pcm[:, 0], np.full(8, 42))  # 21 << 1


def test_corrupt_input_raises_flac_error():
    x = _sig(600)
    blob = bytearray(flac.encode(x, bps=16, block_size=300))
    # frame CRC-16: flip a residual bit near the end of the first frame
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(flac.FlacError):
        flac.decode_pcm(bytes(bad))
    # STREAMINFO MD5 tamper
    bad = bytearray(blob)
    bad[8 + 18] ^= 0xFF
    with pytest.raises(flac.FlacError, match="MD5|CRC"):
        flac.decode_pcm(bytes(bad))
    # truncation
    with pytest.raises(flac.FlacError):
        flac.decode_pcm(bytes(blob[: len(blob) - 7]))
    # bad magic
    with pytest.raises(flac.FlacError, match="fLaC"):
        flac.decode_pcm(b"OggS" + bytes(blob[4:]))


def test_dispatch_parity_with_wav_path():
    """The multimodal audio dispatch decodes FLAC; lossless means the
    mono float signal equals the WAV path's bit for bit."""
    from graph_db_clustering_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
    )

    t = np.arange(1500) / 8000.0
    sig = 0.4 * np.sin(2 * np.pi * 440.0 * t)
    q = np.round(sig * 32767.0).astype(np.int64)
    wav_rate, wav_x = _decode_wav(_encode_wav(8000, q / 32768.0, bits=16))
    flac_rate, flac_x = _decode_wav(flac.encode(q, rate=8000, bps=16))
    assert wav_rate == flac_rate == 8000
    assert np.array_equal(wav_x, flac_x)


def test_stereo_dispatch_downmixes_to_mean():
    from graph_db_clustering_spark.operators.multimodal import _decode_wav

    st = np.stack([_sig(800), _sig(800, seed=9)], axis=1)
    rate, x = _decode_wav(flac.encode(st, rate=22050, stereo_mode="mid_side"))
    want = st.astype(np.float64).mean(axis=1) / 32768.0
    assert rate == 22050
    assert np.allclose(x, want, atol=0)


def test_encoder_rejects_out_of_range_and_3ch():
    with pytest.raises(flac.FlacError, match="range"):
        flac.encode(np.array([40000], np.int64), bps=16)
    with pytest.raises(flac.FlacError, match="channels"):
        flac.encode(np.zeros((10, 3), np.int64))
