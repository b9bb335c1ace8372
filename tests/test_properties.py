"""Hypothesis property tests for the pure-NumPy codec paths (no Spark —
fast, deterministic, seeded by hypothesis itself). These generalize the
hand-picked cases in test_jpeg/test_multimodal: any coefficient block
must decode identically via baseline and progressive codings, the T.81
coefficient bit codec must roundtrip every category, and WAV must
roundtrip any PCM signal within its bit depth's quantization error."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from graph_db_clustering_spark.functions.jpeg import (
    _BitReader,
    _extend,
    _unstuff,
    decode,
)
from graph_db_clustering_spark.operators import multimodal as M
from tests.test_jpeg import (
    _BitWriter,
    _category,
    _emit_coef,
    make_gray_jpeg,
    make_gray_progressive_jpeg,
)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=-2047, max_value=2047))
def test_t81_coefficient_bits_roundtrip(v):
    """F.1.4 encode -> F.2.2.1 EXTEND is the identity for every value in
    the 12-bit coefficient range."""
    s = _category(v)
    w = _BitWriter()
    _emit_coef(w, v, s)
    if s == 0:
        assert v == 0
        return
    # tobytes applies T.81 byte stuffing (0xFF -> 0xFF 0x00); the decoder
    # always unstuffs before bit-reading, so mirror that here
    segs, _ = _unstuff(w.tobytes(), 0)
    r = _BitReader(segs[0])
    assert _extend(r.receive(s), s) == v


_coef = st.integers(min_value=-255, max_value=255)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-400, max_value=400),  # DC
            st.lists(  # sparse AC: (position 1..63, value != 0)
                st.tuples(st.integers(1, 63), _coef.filter(bool)),
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_progressive_decodes_like_baseline(specs):
    """Any coefficient content — dense, sparse, |v|==1 refinement-only
    coefficients, negative DCs, long zero runs — produces the identical
    image through the 4-scan progressive coding and the baseline coding."""
    blocks = []
    for dc, acs in specs:
        b = np.zeros(64, dtype=np.int64)
        b[0] = dc
        for pos, v in acs:
            b[pos] = v
        blocks.append(b.reshape(8, 8))
    base = decode(make_gray_jpeg(blocks, w_blocks=len(blocks), q=1))
    prog = decode(make_gray_progressive_jpeg(blocks, w_blocks=len(blocks), q=1))
    assert (prog == base).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), min_size=1, max_size=200
    ),
    st.sampled_from([16, 32]),
)
def test_wav_pcm_roundtrip_within_quantization(samples, bits):
    """encode -> decode recovers any signal within one quantization step
    of the chosen depth."""
    x = np.array(samples, dtype=np.float64)
    rate, y = M._decode_wav(M._encode_wav(8000, x, bits=bits))
    assert rate == 8000 and len(y) == len(x)
    assert np.abs(y - x).max() <= 2.0 ** -(bits - 1) + 1e-12


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.sampled_from([0, 1, 2, 3, 4]),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_any_shape_filter_interlace(h, w, c, ftype, interlace, seed):
    """PNG is lossless: encode -> decode is the identity for ANY uint8
    image, every filter type, interlaced or not, any channel count."""
    from graph_db_clustering_spark.functions import png

    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png.decode(png.encode(img, filters=ftype, interlace=interlace))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.sampled_from([1, 2, 4, 16]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_nonstandard_depths(h, w, depth, seed):
    """Sub-byte (packed) and 16-bit depths roundtrip losslessly too."""
    from graph_db_clustering_spark.functions import png

    rng = np.random.default_rng(seed)
    if depth == 16:
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        out = png.decode(png.encode(img, filters=4))
    else:
        img = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
        out = png.decode(png.encode(img, bit_depth=depth, filters=2))
    assert np.array_equal(out, img)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_varint_roundtrip_any_int64(v):
    from graph_db_clustering_spark.sources import avro

    enc = avro._write_varint(v)
    dec, pos = avro._read_varint(enc, 0)
    assert (dec, pos) == (v, len(enc))
    assert len(enc) <= 10  # 64-bit zigzag fits 10 varint bytes


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=-(2**62), max_value=2**62),
                "s": st.text(max_size=40),
                "d": st.floats(allow_nan=False, allow_infinity=False, width=64),
                "o": st.one_of(st.none(), st.text(max_size=10)),
            }
        ),
        max_size=8,
    ),
    st.sampled_from(["null", "deflate"]),
)
def test_avro_container_roundtrip_property(rows, codec):
    from graph_db_clustering_spark.sources import avro

    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
            {"name": "o", "type": ["null", "string"]},
        ],
    }
    _, got = avro.decode_container(avro.encode_container(schema, rows, codec=codec))
    assert got == rows


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "warcinfo", "metadata"]),
            st.binary(max_size=200),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_warc_framing_roundtrip_property(records):
    from graph_db_clustering_spark.sources import warc

    blobs = [
        warc.build_record(t, payload, target_uri=f"https://x/{i}")
        for i, (t, payload) in enumerate(records)
    ]
    # plain concatenation AND member-per-record gzip must both re-frame
    plain = list(warc._records_in(b"".join(blobs)))
    via_gzip = [
        rec
        for member in warc._gzip_members(
            b"".join(warc.gzip_member(b) for b in blobs)
        )
        for rec in warc._records_in(member)
    ]
    for parsed in (plain, via_gzip):
        assert len(parsed) == len(records)
        for (h, block), (t, payload) in zip(parsed, records):
            assert h["warc-type"] == t
            assert block == payload


@settings(max_examples=20, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=500),
        max_size=30,
    ).flatmap(
        lambda w: st.lists(st.just(w) | st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=500),
            min_size=1, max_size=12), min_size=1, max_size=25)
    )
)
def test_bpe_word_merges_are_lossless_property(words):
    """Any trained merge table applied to any word concatenates back to
    the word — the per-word invariant under the entry's md5 oracle."""
    from collections import Counter

    from graph_db_clustering_spark.operators.text import _bpe_word

    # train a tiny rank table from the words themselves (pair counts)
    pairs = Counter()
    for w in words:
        syms = list(w)
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += 1
    ranks = {p: i for i, (p, _) in enumerate(pairs.most_common(20))}
    for w in words:
        assert "".join(_bpe_word(w, ranks)) == w


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=120), st.integers(min_value=0, max_value=6))
def test_binary_decoders_fail_controlled_on_garbage(blob, which):
    """Every binary decoder raises ONLY its controlled error surface on
    arbitrary bytes (ValueError family / NotImplementedError) — a bad
    file in a 100 TB corpus must yield a clear per-file error, never an
    IndexError/KeyError/struct.error that reads as an engine bug. The
    probes go further and classify garbage as 'corrupt'/'unknown'."""
    from graph_db_clustering_spark.functions import avi, gif, jpeg, png
    from graph_db_clustering_spark.functions import simple_images as si
    from graph_db_clustering_spark.operators import multimodal as M
    from graph_db_clustering_spark.sources import avro, warc

    from graph_db_clustering_spark.functions import pdf

    decoders = [
        lambda b: list(warc._records_in(b)),
        avro.decode_container,
        gif.frames,
        png.decode,
        jpeg.decode,
        si.decode_tiff,
        pdf.extract_text,
    ]
    try:
        decoders[which](blob)
    except (ValueError, NotImplementedError):
        pass
    # the probes never raise at all
    c, *_ = M._probe_one(blob)
    assert isinstance(c, str)
    c2, *_ = M._image_probe_one(blob)
    assert isinstance(c2, str)


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=2**20),
            st.integers(min_value=0, max_value=2**40),
        ),
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_roaring_roundtrip_property(vals):
    """functions/roaring: encode->decode is identity on any sorted
    de-duplicated 64-bit value set (array containers, bucket splits,
    empty set)."""
    from graph_db_clustering_spark.functions.roaring import (
        decode_rbm_array,
        encode_rbm_array,
    )

    assert decode_rbm_array(encode_rbm_array(vals)) == sorted(set(vals))


@given(
    st.lists(
        st.text(
            alphabet=st.characters(max_codepoint=0x2FF),
            min_size=0, max_size=24,
        ),
        min_size=2, max_size=12,
    )
)
@settings(max_examples=150, deadline=None)
def test_fuzzy_prefilter_never_drops_true_pairs(names):
    """operators/text round 10: the vectorized common-char prefilter in
    fuzzy_name_pairs uses the NECESSARY bound c/n1 + c/n2 >= 5*s - 3
    (c = common byte-bucket count, n = codepoint length). Property: for
    ANY strings — multibyte unicode included, where byte counts exceed
    codepoint lengths and the 127-clamp merges buckets — no pair at
    jw >= 0.88 is ever filtered out (merging buckets and counting
    bytes only LOOSEN the bound)."""
    from graph_db_clustering_spark.operators.text import jaro_winkler

    min_sim = 0.88
    bound = 5.0 * min_sim - 3.0

    def counts(s):
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        return np.bincount(np.minimum(b, 127), minlength=128)

    for i, a in enumerate(names):
        for b in names[i + 1:]:
            jw = jaro_winkler(a, b)
            if jw < min_sim:
                continue
            if not a or not b:
                continue
            c = np.minimum(counts(a), counts(b)).sum()
            assert c / len(a) + c / len(b) >= bound, (a, b, jw)
