"""MPEG-1 Layer III decoder/fixture-encoder (functions/mp3).

The strategy mirrors tests/test_jpeg.py: hand-built bitstreams with
known quantized coefficients pin the decoder against independent NumPy
closed forms (the test reimplements the granule chain as direct matrix
algebra, not the module's FIFO structures), the module's own encoder
provides roundtrip fixtures with a documented SNR bound, and every
scoped gate raises loudly."""

import numpy as np
import pytest

from graph_db_clustering_spark.functions import mp3


def _sine(freq=1000.0, secs=0.5, rate=44100, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def _best_snr(x, y, d_lo=900, d_hi=1300, a=2000, b=8000):
    best = None
    for d in range(d_lo, d_hi):
        xa, ya = x[a:b], y[a + d: b + d]
        if len(ya) < len(xa):
            break
        g = np.dot(xa, ya) / np.dot(xa, xa)
        if abs(g) < 1e-9:
            continue
        snr = 10 * np.log10(np.sum(xa**2) / np.sum((ya / g - xa) ** 2))
        if best is None or snr > best[1]:
            best = (d, snr, g)
    return best


# --- filterbank + transform math ------------------------------------------


def test_analysis_synthesis_reconstruction_better_than_40db():
    """The designed PQMF prototype + the spec's analysis/synthesis
    structures reconstruct to better than -40 dB at the known 481-sample
    filterbank delay (the module docstring's claim)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(32 * 150)
    S = mp3._analysis(x)
    syn = mp3._Synth()
    y = np.concatenate([syn.step(S[t]) for t in range(len(S))])
    d = 481
    xa, ya = x[600: len(y) - d], y[600 + d:]
    ya = ya[: len(xa)]
    g = np.dot(xa, ya) / np.dot(xa, xa)
    snr = 10 * np.log10(np.sum(xa**2) / np.sum((ya / g - xa) ** 2))
    assert snr > 40.0, snr
    assert abs(g - 1.0) < 0.01  # unity-gain calibration (_unity_scale)


def test_mdct_imdct_tdac_exact():
    """Forward MDCT (encoder) and IMDCT+OLA (decoder) including alias
    butterflies and frequency inversion reconstruct the subband stream
    exactly with a one-granule delay."""
    rng = np.random.default_rng(1)
    n_gran = 5
    sub = rng.standard_normal((n_gran * 18, 32))
    prev = np.zeros((32, 18))
    specs = []
    for g in range(n_gran):
        X, prev = mp3._mdct_granule(sub[g * 18: (g + 1) * 18], prev)
        specs.append(mp3._alias_reduce(X, inverse=True))
    overlap = np.zeros((32, 18))
    outs = []
    for g in range(n_gran):
        o, overlap = mp3._imdct_granule(mp3._alias_reduce(specs[g]), overlap)
        outs.append(o)
    rec = np.vstack(outs)
    err = rec[2 * 18: 5 * 18] - sub[1 * 18: 4 * 18]
    assert np.abs(err).max() < 1e-10 * np.abs(sub).max()


def test_known_single_line_granule_matches_direct_reference():
    """A hand-built frame carrying ONE +1 spectral value at a known line
    and global_gain must decode to exactly what the direct matrix
    reference (straight cosine sums, no FIFO machinery) predicts."""
    line, gg = 40, 214  # amplitude 2^((214-210)/4) = 2
    iv = np.zeros(576)
    iv[line] = 1.0
    xr = mp3._requantize(iv, {"global_gain": gg, "scalefac_scale": 0,
                              "preflag": 0}, [0] * 21, mp3.SFB_LONG[44100])
    assert xr[line] == pytest.approx(2.0)
    xr = mp3._alias_reduce(xr)
    overlap = np.zeros((32, 18))
    sub, overlap2 = mp3._imdct_granule(xr, overlap)
    # direct reference for the same spectral input
    sb, k = divmod(line, 18)
    X = np.zeros(18)
    # alias butterflies couple subband boundaries; reuse requantized xr
    ref_out = np.zeros((18, 32))
    for s_i in range(32):
        coeffs = xr[s_i * 18: (s_i + 1) * 18]
        x36 = np.array([
            sum(coeffs[kk] * np.cos(np.pi / 72 * (2 * n + 1 + 18) * (2 * kk + 1))
                for kk in range(18))
            for n in range(36)
        ]) * np.sin(np.pi / 36 * (np.arange(36) + 0.5))
        ref_out[:, s_i] = x36[:18]  # first granule: overlap is zero
    ref_out[1::2, 1::2] *= -1.0
    assert np.allclose(sub, ref_out, atol=1e-9)


# --- bitstream -------------------------------------------------------------


def test_count1_table_b_bit_exactness():
    """The (v,w,x,y)=(1,0,1,1) quadruple codes as the 4-bit one's
    complement 0b0100 followed by one sign bit per nonzero value."""
    w = mp3._BitWriter()
    # encoder path: quadruple code then signs (0=+, 1=-)
    code = 0b1011  # nonzero mask of (1,0,-1,1)
    w.write(code ^ 0xF, 4)
    for v in (1, -1, 1):
        w.write(1 if v < 0 else 0, 1)
    w.pad()
    data = bytes(w.buf)
    bits = mp3._Bits(data)
    g = {"big_values": 0, "count1table_select": 1, "table_select": [0, 0, 0],
         "region0_count": 0, "region1_count": 0}
    iv = mp3._decode_huffman(bits, g, mp3.SFB_LONG[44100], end_bit=7)
    assert list(iv[:4]) == [1.0, 0.0, -1.0, 1.0]
    assert not iv[4:].any()


def test_scalefactors_attenuate_their_band():
    """A nonzero scalefactor in a band attenuates exactly that band by
    2^(-0.5*sf) (scalefac_scale=0) — pinned by two requantizations."""
    sfb = mp3.SFB_LONG[44100]
    iv = np.zeros(576)
    iv[sfb[12]] = 1.0  # first line of band 12
    g = {"global_gain": 210, "scalefac_scale": 0, "preflag": 0}
    sf0 = [0] * 21
    sf1 = [0] * 21
    sf1[12] = 3
    x0 = mp3._requantize(iv, g, sf0, sfb)
    x1 = mp3._requantize(iv, g, sf1, sfb)
    assert x0[sfb[12]] == pytest.approx(1.0)
    assert x1[sfb[12]] == pytest.approx(2.0 ** (-0.5 * 3))
    # scalefac_scale doubles the step
    x2 = mp3._requantize(iv, dict(g, scalefac_scale=1), sf1, sfb)
    assert x2[sfb[12]] == pytest.approx(2.0 ** (-1.0 * 3))
    # preflag adds pretab (band 12 -> +1)
    x3 = mp3._requantize(iv, dict(g, preflag=1), sf1, sfb)
    assert x3[sfb[12]] == pytest.approx(2.0 ** (-0.5 * 4))


def test_side_info_roundtrip_through_parser():
    """encode()'s side info parses back to the declared granule fields."""
    blob = mp3.encode(_sine(secs=0.1), rate=44100, bitrate=160_000)
    hdr = mp3._parse_header(blob[:4])
    assert hdr["rate"] == 44100 and hdr["bitrate"] == 160_000
    si = mp3._parse_side_info(blob[4: 4 + 17])
    assert si["main_data_begin"] == 0
    for chans in si["granules"]:
        for g in chans:
            # round 9: granules with energy carry real big-values
            # regions coded with a bundled table; count1 defaults to B
            assert g["count1table_select"] == 1
            assert g["window_switching"] == 0
            t = g["table_select"]
            assert t[0] == t[1] == t[2] and t[0] in (0, 1, 2, 5, 7, 10, 15)
            if g["big_values"]:
                assert t[0] != 0


# --- end-to-end ------------------------------------------------------------


def test_roundtrip_sine_snr_documented():
    """encode -> decode on a line-centered sine: the coarse {-1,0,+1}
    fixture quantizer reconstructs with SNR >= 12 dB (measured ~14.7)
    and near-unity gain at the fixed encoder+decoder delay."""
    rate = 44100
    f = (100 + 0.5) * rate / 1152  # center of spectral line 100
    x = _sine(freq=f, secs=0.5, rate=rate)
    r, y = mp3.decode(mp3.encode(x, rate=rate, bitrate=160_000))
    assert r == rate
    assert len(y) == -(-len(x) // 1152) * 1152
    d, snr, g = _best_snr(x, y)
    assert snr >= 12.0, (d, snr, g)
    assert 0.8 < abs(g) < 1.2


def test_roundtrip_silence_is_silent():
    r, y = mp3.decode(mp3.encode(np.zeros(2304), rate=44100))
    assert np.abs(y).max() < 1e-12


def test_decode_skips_id3v2_and_trailing_tag():
    x = _sine(secs=0.1)
    blob = mp3.encode(x, rate=44100)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    tagged = id3 + blob + b"TAG" + b"\x00" * 125  # ID3v1 trailer
    r, y = mp3.decode(tagged)
    r2, y2 = mp3.decode(blob)
    assert r == r2 and np.array_equal(y, y2)


def test_duration_matches_audio_probe():
    """audio_probe's header-math duration and the decoder's actual
    sample count agree (VERDICT r6 Next #4's cross-check)."""
    from graph_db_clustering_spark.operators.multimodal import _probe_one_inner

    x = _sine(secs=1.0)
    blob = mp3.encode(x, rate=44100, bitrate=160_000)
    container, rate, channels, duration = _probe_one_inner(blob)
    assert (container, rate, channels) == ("mp3", 44100, 1)
    r, y = mp3.decode(blob)
    assert abs(len(y) / r - duration) < 0.1


def test_audio_features_decodes_mp3_bytes(spark):
    """The multimodal dispatch accepts MP3 alongside WAV."""
    import pandas as pd

    from graph_db_clustering_spark.operators import multimodal

    x = _sine(freq=1000.0, secs=0.25)
    blob = mp3.encode(x, rate=44100, bitrate=160_000)
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": [1], "content": [bytearray(blob)]})
    )
    row = multimodal.audio_features(df).first()
    assert row.sample_rate == 44100.0
    assert row.n_samples == -(-len(x) // 1152) * 1152
    # the dominant spectral line survives the coarse quantizer
    assert 800.0 < row.spectral_centroid_hz < 1600.0


# --- gates and corrupt input ----------------------------------------------


def test_gates_raise_loudly():
    blob = bytearray(mp3.encode(_sine(secs=0.1), rate=44100))
    # reserved version bits (01) raise as corrupt
    vres = bytearray(blob)
    vres[1] = (vres[1] & ~0x18) | 0x08
    with pytest.raises(mp3.Mp3Error, match="reserved version"):
        mp3.decode(bytes(vres))
    # free-format with NO second syncword to measure against: loud
    flen = 144 * 160_000 // 44100
    free = bytearray(blob[:flen])  # one frame only
    free[2] &= 0x0F
    with pytest.raises(mp3.Mp3Error, match="second syncword"):
        mp3.decode(bytes(free))
    with pytest.raises(mp3.Mp3Error, match="no frames"):
        mp3.decode(b"")


def test_unsupported_huffman_table_raises_by_name():
    """A frame whose side info selects an UNBUNDLED big-values table
    (13, one of the 16x16 set) must raise naming the table — never
    decode garbage silently. Tables 1-9 are bundled as of round 9."""
    x = _sine(secs=0.05)
    blob = bytearray(mp3.encode(x, rate=44100, bitrate=160_000))
    # rebuild side info with big_values=1, table_select[0]=7
    w = mp3._BitWriter()
    w.write(0, 9)
    w.write(0, 5)
    for _ in range(4):
        w.write(0, 1)
    for _ in range(2):
        w.write(40, 12)  # part2_3_length
        w.write(1, 9)  # big_values = 1 pair
        w.write(210, 8)
        w.write(0, 4)
        w.write(0, 1)
        w.write(16, 5)  # table_select[0] = 16  <- the gate
        w.write(0, 5)
        w.write(0, 5)
        w.write(0, 4)
        w.write(0, 3)
        w.write(0, 1)
        w.write(0, 1)
        w.write(1, 1)
    w.pad()
    blob[4: 4 + 17] = bytes(w.buf)
    with pytest.raises(NotImplementedError, match="table 16"):
        mp3.decode(bytes(blob))


def test_reservoir_underflow_raises():
    x = _sine(secs=0.05)
    blob = bytearray(mp3.encode(x, rate=44100, bitrate=160_000))
    # main_data_begin=1 on the FIRST frame: nothing in the reservoir.
    # mdb occupies side-info bits 0-8 = byte 4 (all) + bit 7 of byte 5.
    blob[5] |= 0x80
    with pytest.raises(mp3.Mp3Error, match="reservoir"):
        mp3.decode(bytes(blob))


def test_truncated_frame_raises():
    blob = mp3.encode(_sine(secs=0.1), rate=44100)
    with pytest.raises(mp3.Mp3Error, match="truncated"):
        mp3.decode(blob[: len(blob) - 100])


# --- stereo (round 7, same round as mono) ----------------------------------


def _stereo_pair(secs=0.5):
    # line-centered frequencies on lines the coarse fixture quantizer
    # reconstructs well (mono measures 14.7 dB at line 100, 11.8 at
    # line 150; per-line variation is a quantizer property, documented
    # in test_roundtrip_sine_snr_documented)
    rate = 44100
    l = _sine(freq=(100 + 0.5) * rate / 1152, secs=secs)
    r = _sine(freq=(150 + 0.5) * rate / 1152, secs=secs)
    return l, r, np.stack([l, r], axis=1)


@pytest.mark.parametrize("ms", [False, True])
def test_stereo_roundtrip_channels_separate(ms):
    """Plain stereo and MS joint stereo both reconstruct their channels:
    per-channel SNR at the fixture quantizer's documented level, and the
    cross-channel SNR far below it (the 800 Hz left tone does NOT
    reconstruct in the right channel)."""
    l, r, st = _stereo_pair()
    blob = mp3.encode(st, bitrate=320_000, ms_stereo=ms)
    rate, y = mp3.decode_pcm(blob)
    assert rate == 44100 and y.ndim == 2 and y.shape[1] == 2
    dl, snr_l, _ = _best_snr(l, y[:, 0])
    dr, snr_r, _ = _best_snr(r, y[:, 1])
    assert snr_l >= 10.0, snr_l
    assert snr_r >= 10.0, snr_r
    cross = _best_snr(l, y[:, 1])
    assert cross is None or cross[1] < 3.0, cross


def test_stereo_header_modes():
    _, _, st = _stereo_pair(secs=0.1)
    plain = mp3.encode(st, bitrate=320_000)
    hdr = mp3._parse_header(plain[:4])
    assert hdr["nch"] == 2 and not hdr["ms_stereo"]
    ms = mp3.encode(st, bitrate=320_000, ms_stereo=True)
    hdr = mp3._parse_header(ms[:4])
    assert hdr["nch"] == 2 and hdr["ms_stereo"]
    # stereo side info is 32 bytes; parser consumes all granule fields
    si = mp3._parse_side_info(ms[4: 4 + 32], nch=2)
    assert len(si["granules"]) == 2 and len(si["granules"][0]) == 2
    assert len(si["scfsi"]) == 2


def test_stereo_downmix_surface():
    """decode() (the audio_features surface) downmixes to channel mean:
    an out-of-phase pair cancels to ~silence, in-phase does not."""
    l = _sine(freq=700.0, secs=0.2)
    anti = np.stack([l, -l], axis=1)
    rate, y = mp3.decode(mp3.encode(anti, bitrate=320_000))
    assert y.ndim == 1
    assert np.abs(y).max() < 0.05  # L + (-L) cancels in the mean
    rate, y2 = mp3.decode(mp3.encode(np.stack([l, l], axis=1), bitrate=320_000))
    assert np.abs(y2).max() > 0.2


def test_ms_stream_is_genuinely_ms_on_the_wire():
    """For identical channels the MS side channel is all zero — the
    S granules carry no count1 data, so the MS stream is smaller than
    the plain-stereo one for correlated input (proves the encoder is
    not just writing L/R under an MS header)."""
    l = _sine(freq=900.0, secs=0.3)
    same = np.stack([l, l], axis=1)
    ms = mp3.encode(same, bitrate=320_000, ms_stereo=True)
    si = mp3._parse_side_info(ms[4: 4 + 32], nch=2)
    # wire order gr0ch0 gr0ch1: channel 1 is S = (L-R)/sqrt2 = 0
    assert si["granules"][0][1]["part2_3_length"] == 0
    assert si["granules"][0][0]["part2_3_length"] > 0


def test_dual_channel_mode_decodes_as_stereo():
    _, _, st = _stereo_pair(secs=0.1)
    blob = bytearray(mp3.encode(st, bitrate=320_000))
    # patch every frame header's mode bits from 00 (stereo) to 10 (dual)
    hdr = mp3._parse_header(bytes(blob[:4]))
    flen = hdr["frame_len"]
    for pos in range(0, len(blob), flen):
        blob[pos + 3] = (blob[pos + 3] & 0x0F) | (2 << 6)
    rate, y = mp3.decode_pcm(bytes(blob))
    assert y.ndim == 2 and y.shape[1] == 2


# --- round 9: bundled Huffman tables + short blocks -------------------------


def test_bundled_tables_prefix_free_and_complete():
    """Every bundled Table B.7 code table is a COMPLETE prefix code:
    Kraft sum exactly 1 and no codeword a prefix of another (the
    import-time validator enforces this; re-asserted here so a data
    edit can't slip through with validation removed)."""
    for tid, (xlen, linbits, hc, hl) in mp3.HUFF_BIG.items():
        assert len(hc) == len(hl) == xlen * xlen
        mp3._validate_huffman(hc, hl, str(tid))
        assert linbits == 0  # escape tables not bundled yet
    mp3._validate_huffman(mp3.COUNT1_A[0], mp3.COUNT1_A[1], "A")


@pytest.mark.parametrize("tid", sorted(mp3.HUFF_BIG))
def test_every_bigvalues_symbol_roundtrips(tid):
    """For each bundled table: every (x, y) pair (all sign
    combinations) written by the encoder decodes back bit-exactly
    through _decode_huffman."""
    xlen = mp3.HUFF_BIG[tid][0]
    vals = []
    for x in range(xlen):
        for y in range(xlen):
            sx = -1 if (x + y) % 2 else 1
            vals += [sx * x, -y]
    iv = np.zeros(576)
    iv[:len(vals)] = vals
    big_end = len(vals) + (len(vals) % 2)
    w, meta = mp3._encode_granule_bits(iv.astype(np.int64))
    nbits = w.bitlen()  # part2_3_length: payload only, pad excluded
    w.pad()
    g = {"big_values": meta["big_values"], "count1table_select": 1,
         "table_select": [meta["table"]] * 3,
         "region0_count": 7, "region1_count": 7}
    bits = mp3._Bits(bytes(w.buf))
    got = mp3._decode_huffman(bits, g, mp3.SFB_LONG[44100], end_bit=nbits)
    assert list(got[:big_end]) == list(iv[:big_end])


def test_count1_table_a_roundtrip_matches_table_b():
    """The SAME quantized spectrum coded through count1 table A and
    table B decodes to identical PCM — only the bit layout differs."""
    x = _sine(secs=0.2)
    _, ya = mp3.decode(mp3.encode(x, rate=44100, bitrate=160_000, count1_a=True))
    _, yb = mp3.decode(mp3.encode(x, rate=44100, bitrate=160_000))
    assert np.allclose(ya, yb, atol=1e-12)
    # and table A genuinely appears on the wire (count1table_select=0)
    blob = mp3.encode(x, rate=44100, bitrate=160_000, count1_a=True)
    si = mp3._parse_side_info(blob[4: 4 + 17])
    assert all(g["count1table_select"] == 0
               for chans in si["granules"] for g in chans)


def test_short_block_stream_roundtrips():
    """block_type="short" frames carry window_switching/block_type 2 on
    the wire and decode through the 12-point IMDCT path with SNR
    comparable to the long path."""
    rate = 44100
    f = (40 + 0.5) * rate / 1152
    x = _sine(freq=f, secs=0.5, rate=rate)
    blob = mp3.encode(x, rate=rate, bitrate=160_000, block_type="short")
    si = mp3._parse_side_info(blob[4: 4 + 17])
    for chans in si["granules"]:
        for g in chans:
            assert g["window_switching"] == 1 and g["block_type"] == 2
            assert g["mixed_block"] == 0
            assert len(g["table_select"]) == 2
    r, y = mp3.decode(blob)
    assert r == rate
    d, snr, gain = _best_snr(x, y)
    assert snr >= 10.0, (d, snr, gain)
    assert 0.7 < abs(gain) < 1.3


def test_short_reorder_is_inverse_of_encoder_perm():
    """_reorder_short (decoder) is the exact inverse of _short_perm
    (encoder wire order) for every sampling rate, pure-short and the
    mixed tail."""
    for rate, sfb_s in mp3.SFB_SHORT.items():
        perm = mp3._short_perm(sfb_s)
        assert sorted(perm) == list(range(576))
        fb = np.arange(576, dtype=np.float64)
        wire = fb[perm]
        back = mp3._reorder_short(wire, sfb_s, mixed=False)
        assert np.array_equal(back, fb)
        # mixed: first 36 lines pass through untouched
        wire_m = fb.copy()
        wire_m[36:] = fb[perm][36:] if False else wire_m[36:]
        got = mp3._reorder_short(fb, sfb_s, mixed=True)
        assert np.array_equal(got[:36], fb[:36])


def test_short_imdct_tdac_reconstructs():
    """Forward short MDCT -> inverse short IMDCT with overlap-add
    reconstructs the interior of a random subband signal exactly
    (TDAC), matching the long path's exactness guarantee."""
    rng = np.random.default_rng(7)
    n_gran = 6
    sub = rng.normal(size=(n_gran * 18, 32))
    prev_f = np.zeros((32, 18))
    specs = []
    for gidx in range(n_gran):
        X, prev_f = mp3._mdct_granule_short(sub[gidx * 18:(gidx + 1) * 18], prev_f)
        specs.append(X)
    overlap = np.zeros((32, 18))
    outs = []
    g = {"block_type": 2, "mixed_block": 0}
    for X in specs:
        o, overlap = mp3._imdct_granule(X, overlap, g)
        outs.append(o)
    got = np.concatenate(outs)  # [n_gran*18, 32]
    # one-granule delay, and the first/last 6 samples of the stream
    # fall outside any window pair — compare the interior
    want = sub[18:(n_gran - 1) * 18]
    have = got[36:n_gran * 18]
    assert want.shape == have.shape
    err = np.abs(want - have).max()
    assert err < 1e-9, err


def test_subblock_gain_attenuates_its_window():
    """Requantization applies 2^(-2*subblock_gain[w]) to window w of
    every short band — per-window, not per-granule."""
    iv = np.zeros(576)
    sfb_s = mp3.SFB_SHORT[44100]
    # one value in each window of short band 4 (width 6, base 66)
    base, width = 3 * sfb_s[4], sfb_s[5] - sfb_s[4]
    for w in range(3):
        iv[base + w * width] = 1.0
    g = {"global_gain": 210, "scalefac_scale": 0, "preflag": 0,
         "block_type": 2, "mixed_block": 0, "subblock_gain": [0, 1, 2]}
    sfs = [[0] * 3 for _ in range(13)]
    xr = mp3._requantize(iv, g, None, mp3.SFB_LONG[44100], sfs, sfb_s)
    assert xr[base] == 1.0
    assert xr[base + width] == 0.25
    assert xr[base + 2 * width] == 0.0625


def test_dense_tables_roundtrip_and_selection():
    """Round 10: tables 10-13/15 — the encoder now quantizes to
    |iv| <= 15 and selects the dense 16x16 table 15 (or 8x8 table 10)
    for loud material; the decoder round-trips it. Asserts the new
    tables are actually EXERCISED (side info names them), the decode
    lands exactly on part2_3_length (a wrong 256-entry table
    desynchronizes with overwhelming probability), and SNR improves
    over the old coarse 5-level ladder."""
    import collections

    import numpy as np

    t = np.arange(int(44100 * 0.5)) / 44100.0
    # rich multi-tone: enough spectral spread that vmax lands high
    x = (
        0.7 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 1320 * t)
        + 0.08 * np.sin(2 * np.pi * 3000 * t)
    )
    blob = mp3.encode(x, rate=44100, bitrate=320_000)
    # survey the tables the encoder selected
    pos, used = 0, collections.Counter()
    data = blob
    while pos + 4 <= len(data):
        try:
            h = mp3._parse_header(data[pos:pos + 4])
        except mp3.Mp3Error:
            break
        si = mp3._parse_side_info(data[pos + 4:pos + 4 + 17], 1)
        for gr in si["granules"]:
            for g in gr:
                for tab in g["table_select"]:
                    used[tab] += 1
        pos += h["frame_len"]
    assert any(tab in used for tab in (10, 15)), dict(used)
    rate, y = mp3.decode(blob)
    _d, snr, g = _best_snr(x, y)
    assert snr > 12.0, snr  # flat-quantizer bound on multi-tone
    assert 0.8 < abs(g) < 1.2
    # pure line-centered sine: table 15's 16 levels lift SNR well past
    # the old 5-level ladder's measured ~14.7 dB
    f = (100 + 0.5) * 44100 / 1152
    xs = _sine(freq=f, secs=0.5, rate=44100)
    blob2 = mp3.encode(xs, rate=44100, bitrate=320_000)
    si = mp3._parse_side_info(blob2[4:4 + 17], 1)
    assert si["granules"][0][0]["table_select"][0] == 15
    _r, ys = mp3.decode(blob2)
    _d2, snr2, _g2 = _best_snr(xs, ys)
    assert snr2 > 20.0, snr2


def test_mpeg2_lsf_roundtrip():
    """Round 10: MPEG-2 LSF — 1 granule per frame, 8-bit
    main_data_begin, 9-bit scalefac_compress, no scfsi/preflag bits,
    LSF band tables. The fixture encoder's LSF mode round-trips long
    AND short blocks at every LSF rate, exercising the same Huffman
    tables as MPEG-1 under the LSF framing."""
    for rate in (22050, 24000, 16000):
        f = (100 + 0.5) * rate / 1152
        x = _sine(freq=f, secs=0.4, rate=rate) * 1.2  # drive vmax high
        x = np.clip(x, -0.95, 0.95)
        blob = mp3.encode(x, rate=rate, bitrate=64_000)
        h = mp3._parse_header(blob[:4])
        assert h["lsf"] and h["rate"] == rate
        r, y = mp3.decode(blob)
        assert r == rate
        assert len(y) == -(-len(x) // 576) * 576  # 576/frame, 1 granule
        _d, snr, g = _best_snr(x, y, d_lo=400, d_hi=1400, a=1000, b=5000)
        assert snr > 18.0, (rate, snr)
    # short blocks through the LSF short-band tables
    x = _sine(freq=1000.0, secs=0.3, rate=22050)
    r, y = mp3.decode(
        mp3.encode(x, rate=22050, bitrate=64_000, block_type="short")
    )
    _d, snr, _g = _best_snr(x, y, d_lo=400, d_hi=1400, a=1000, b=5000)
    assert snr > 15.0, snr
    # stereo LSF side info is 17 bytes
    xs = np.stack([x, x * 0.5], axis=1)
    r2, y2 = mp3.decode_pcm(mp3.encode(xs, rate=22050, bitrate=128_000))
    assert y2.shape[1] == 2


def test_mpeg2_real_world_file_decodes():
    """A REAL MPEG-2 file from this machine (LAME-encoded, 22.05 kHz
    mono, 45 frames of digital silence): every granule must land
    exactly on its part2_3_length through the LSF side-info layout —
    and silence must decode to silence with the exact frame-quantized
    duration. Skipped when the host file is absent."""
    import os

    path = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
        "test_data/test.mp3"
    )
    if not os.path.exists(path):
        pytest.skip("host fixture not present")
    with open(path, "rb") as fh:
        data = fh.read()
    rate, x = mp3.decode(data)
    assert rate == 22050
    assert len(x) == 45 * 576  # 45 single-granule LSF frames
    assert float(np.abs(x).max()) == 0.0  # digital silence in == out


def test_intensity_stereo_decodes_closed_form():
    """Round 10: intensity stereo. A hand-built joint-stereo frame —
    left granule carries real table-coded spectrum, right granule is
    all-zero with its scalefactor slots holding is_pos values — must
    decode to the spec mix l=L*ratio/(1+ratio), r=L/(1+ratio),
    ratio=tan(is_pos*pi/12), computed independently here through the
    same synthesis chain by feeding the EXPECTED spectra to two mono
    decoders' tails. is_pos 6 -> all left; 7 -> band left untouched."""
    rate = 44100
    sfb = mp3.SFB_LONG[rate]
    # left spectrum: constant 1.0 on lines 0..285 (bands 0..~19)
    iv = np.zeros(576)
    iv[:286] = 1.0
    gw, meta = mp3._encode_granule_bits(iv.astype(np.int64))
    # right granule: zero spectrum, scalefac_compress 13 -> slen (3,3);
    # 21 scalefactor slots carry is_pos values
    is_pos = [(b % 8) for b in range(21)]  # 0..7 cycling
    rw = mp3._BitWriter()
    for band, ip in enumerate(is_pos):
        rw.write(ip, 3)
    frame_len = 144 * 160_000 // rate
    side = mp3._BitWriter()
    side.write(0, 9)
    side.write(0, 3)
    for _ in range(8):
        side.write(0, 1)  # scfsi
    for gr in range(2):
        for gbits, big, tab, c1, sfc in (
            (gw.bitlen(), meta["big_values"], meta["table"],
             meta["c1sel"], 0),
            (rw.bitlen(), 0, 0, 1, 13),
        ):
            side.write(gbits, 12)
            side.write(big, 9)
            side.write(210, 8)  # global_gain -> unity
            side.write(sfc, 4)
            side.write(0, 1)  # long block
            for _ in range(3):
                side.write(tab, 5)
            side.write(7, 4)
            side.write(7, 3)
            side.write(0, 1)  # preflag
            side.write(0, 1)  # scalefac_scale (is_pos slots still read)
            side.write(c1, 1)
    side.pad()
    assert len(side.buf) == 32
    main = mp3._BitWriter()
    for _gr in range(2):
        main.extend(gw)
        main.extend(rw)
    main.pad()
    hdr = bytes([
        0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
        (mp3.BITRATES_V1L3.index(160) << 4) | (0 << 2),
        (1 << 6) | (1 << 4),  # joint stereo, intensity ON (no MS)
    ])
    body = hdr + bytes(side.buf) + bytes(main.buf)
    assert len(body) <= frame_len
    blob = body + b"\x00" * (frame_len - len(body))
    r, y = mp3.decode_pcm(blob)
    assert r == rate and y.shape == (1152, 2)
    # expected: the right channel is ALL zero, so its zero part starts
    # at line 0 and EVERY band is in the intensity region. Build the
    # expected L/R spectra and push them through the same mono tail.
    xl = np.sign(iv) * np.abs(iv) ** (4.0 / 3.0)
    exp_l, exp_r = xl.copy(), np.zeros(576)
    for band in range(len(sfb) - 1):
        lo, hi = sfb[band], sfb[band + 1]
        ip = is_pos[min(band, 20)]
        if ip == 7:
            continue
        seg = xl[lo:hi].copy()
        if ip == 6:
            exp_l[lo:hi], exp_r[lo:hi] = seg, 0.0
        else:
            ratio = np.tan(ip * np.pi / 12.0)
            exp_l[lo:hi] = seg * ratio / (1 + ratio)
            exp_r[lo:hi] = seg / (1 + ratio)
    # compare the stereo decode against two mono syntheses of the
    # expected spectra (is_pos 7 bands pass the left through untouched)
    got_l, got_r = y[:, 0], y[:, 1]
    def synth(spec):
        g = {"block_type": 0, "mixed_block": 0}
        xr = mp3._alias_reduce(spec.copy())
        sub, _ = mp3._imdct_granule(xr, np.zeros((32, 18)), g)
        s = mp3._Synth()
        return np.concatenate([s.step(sub[t]) for t in range(18)])
    want_l = synth(exp_l)
    want_r = synth(exp_r)
    assert np.allclose(got_l[:576], want_l, atol=1e-9)
    assert np.allclose(got_r[:576], want_r, atol=1e-9)


def test_free_format_bitrate_decodes():
    """Round 10: free-format streams (bitrate_index 0) decode — the
    constant frame length is measured from verified syncword distances
    and the result is BIT-IDENTICAL to the explicit-bitrate decode of
    the same frames."""
    x = _sine(secs=0.3)
    blob = bytearray(mp3.encode(x, rate=44100, bitrate=160_000))
    flen = 144 * 160_000 // 44100
    for p in range(0, len(blob), flen):
        assert blob[p] == 0xFF
        blob[p + 2] &= 0x0F  # bitrate_index -> 0 on every frame
    r, y = mp3.decode(bytes(blob))
    r2, want = mp3.decode(mp3.encode(x, rate=44100, bitrate=160_000))
    assert r == r2 == 44100
    assert np.array_equal(y, want)
    # probe surface agrees on the back-derived bitrate
    h = mp3._parse_header(bytes(blob[:4]), free_len=flen)
    # the back-derived bitrate is slot-quantized (free format exists
    # precisely for nonstandard rates): within 1% here
    assert abs(h["bitrate"] - 160_000) < 1600 and h["frame_len"] == flen


def test_mpeg25_roundtrip():
    """Round 10: MPEG-2.5 (version bits 00) — LSF framing at
    11025/12000/8000 Hz with the extension's band tables (8 kHz has
    the distinctive packed-top long row). Roundtrip at every rate."""
    for rate in (11025, 12000, 8000):
        f = (60 + 0.5) * rate / 1152
        x = _sine(freq=f, secs=0.6, rate=rate) * 0.6
        blob = mp3.encode(x, rate=rate, bitrate=64_000)
        h = mp3._parse_header(blob[:4])
        assert h["lsf"] and h["rate"] == rate
        assert (blob[1] >> 3) & 3 == 0  # version bits 00
        r, y = mp3.decode(blob)
        assert r == rate
        assert len(y) == -(-len(x) // 576) * 576
        _d, snr, _g = _best_snr(x, y, d_lo=400, d_hi=1400, a=800, b=4000)
        assert snr > 18.0, (rate, snr)


def test_layer1_roundtrip_and_gates():
    """Round 10: MPEG-1 Layer I — 384-sample frames, 4-byte slots,
    uniform fixture allocation, spec requantization, the SAME
    synthesis filterbank as Layer III. Stereo works; Layer II and
    Layer I bound-intensity mode still gate by name."""
    x = _sine(secs=0.3)
    blob = mp3.encode_layer1(x, rate=44100, bitrate=256_000)
    h = mp3._parse_header(blob[:4])
    assert h["layer1"] and h["frame_len"] == (12 * 256_000 // 44100) * 4
    r, y = mp3.decode(blob)
    assert r == 44100 and len(y) == -(-len(x) // 384) * 384
    _d, snr, g = _best_snr(x, y, d_lo=200, d_hi=600, a=1000, b=8000)
    assert snr > 40.0, snr  # 11-bit uniform quantization
    # stereo
    xs = np.stack([x, 0.5 * x], axis=1)
    r2, y2 = mp3.decode_pcm(mp3.encode_layer1(xs, rate=44100,
                                              bitrate=448_000))
    assert y2.shape == (len(y), 2)
    # Layer II gate, by name
    l2 = bytearray(blob)
    l2[1] = (l2[1] & ~0x06) | (2 << 1)
    with pytest.raises(NotImplementedError, match="Layer II"):
        mp3.decode(bytes(l2))
    # forbidden allocation 15 raises
    bad = bytearray(blob)
    bad[4] |= 0xF0  # first subband alloc -> 15
    with pytest.raises(mp3.Mp3Error, match="allocation 15"):
        mp3.decode(bytes(bad))


def test_repaired_huffman_leaves_gate_loudly():
    """Round 11 (ADVICE r10): the two validator-REPAIRED Table B.7
    entries — t12 (1,7) and t13 (15,15) — cannot be cross-checked in
    this environment, so a bitstream that lands on one of those leaves
    raises instead of risking silent mis-decode. Every OTHER codeword
    of the same tables (independently transcribed) still decodes."""
    import numpy as np

    sfb = mp3.SFB_LONG[44100]

    def decode_pair(table, x, y, extra_pairs=()):
        xlen, _lb, hc, hl = mp3.HUFF_BIG[table]
        w = mp3._BitWriter()
        pairs = [(x, y), *extra_pairs]
        nbits = 0
        for px, py in pairs:
            sym = px * xlen + py
            w.write(hc[sym], hl[sym])
            nbits += hl[sym]
            if px:
                w.write(0, 1)
                nbits += 1
            if py:
                w.write(0, 1)
                nbits += 1
        w.write(0, 32)  # slack
        g = {
            "big_values": len(pairs), "window_switching": 0,
            "region0_count": 15, "region1_count": 7,
            "table_select": [table, 0, 0], "count1table_select": 1,
        }
        bits = mp3._Bits(bytes(w.buf) + b"\x00" * 4)
        return mp3._decode_huffman(bits, g, sfb, end_bit=nbits)

    # non-repaired codewords of t12 and t13 decode fine
    iv12 = decode_pair(12, 3, 2)
    assert iv12[0] == 3.0 and iv12[1] == 2.0
    iv13 = decode_pair(13, 14, 15)
    assert iv13[0] == 14.0 and iv13[1] == 15.0
    # the repaired leaves gate loudly
    with pytest.raises(NotImplementedError, match="REPAIRED"):
        decode_pair(12, 1, 7)
    with pytest.raises(NotImplementedError, match="REPAIRED"):
        decode_pair(13, 15, 15)
