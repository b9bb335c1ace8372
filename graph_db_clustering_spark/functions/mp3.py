"""Pure-NumPy MPEG-1 Audio Layer III (MP3) decoder + fixture encoder.

Scope (rounds 7-9): MPEG-1 Layer III, mono/stereo/dual-channel/
MS joint stereo, long AND short/mixed blocks. The decode chain is the
full spec pipeline — frame sync + header, side info (17 bytes mono /
32 bytes two-channel, wire order gr0ch0 gr0ch1 gr1ch0 gr1ch1),
per-channel bit-reservoir main-data assembly across frames
(main_data_begin), MS reconstruction li=(mi+si)/sqrt2 ri=(mi-si)/sqrt2
on the requantized spectra, scalefactor decode (slen1/slen2 table,
scfsi granule-1 reuse; short 12x3 and mixed 8-long+short layouts),
Huffman-coded spectrum, requantization (global_gain / scalefac_scale /
preflag / pretab / per-window subblock_gain), short-block reorder,
alias-reduction butterflies (all boundaries long, the long pair only
for mixed, none for pure short), the hybrid IMDCT (36-point with the
long/start/stop windows; three 12-point transforms per subband for
short), frequency inversion, and the spec's V/U/W polyphase synthesis
structure (ISO/IEC 11172-3 figure 3-A.2).

The entropy layer (round 10): big-values Huffman tables 1-3, 5-13
and 15 plus BOTH count1 tables are bundled — transcriptions of the public
spec's Table B.7, each VALIDATED at import to be a complete prefix
code (Kraft sum exactly 1, no code a prefix of another), so a
transcription slip in the lengths cannot ship silently. The 8x8 and
linbits escape tables (16-31) are NOT bundled: this environment
has no reference decoder to cross-check a ~900-number transcription
against, and a wrong Huffman table decodes *garbage without erroring*
— the worst failure mode for a data pipeline — so selecting one
raises NotImplementedError naming the table. Practical consequence: a
real-world MP3 whose frames stay within tables 0-13/15 decodes fully
(that now includes the dense 16x16 tables LAME picks for loud
non-escape material); frames selecting the linbits tables 16-31 still
gate. Transcription risk note: tables 10-12 and 13/15 passed the
import-time Kraft-completeness + prefix-freeness validation as
transcribed, with two single-entry repairs (t12 (1,7): 9->8 bits;
t13 (15,15): code uniquely forced by the other 255 entries — a
Kraft-complete table has exactly one free slot, so the validator
DETERMINED the value rather than trusting recall). Round 11
(ADVICE r10): structural completeness cannot rule out COMPENSATING
transcription errors, so the two repaired leaves are gated at decode
time — a bitstream that actually lands on t12 (1,7) or t13 (15,15)
raises NotImplementedError until an independent transcription or
reference decoder exists to cross-check them; all other codewords of
those tables (matched by their own transcribed patterns) decode, and
the repo's encoder never selects t12/t13. Round 12 (VERDICT r11 #10):
this gate is PERMANENT for this environment — a second independent
transcription would have to come from outside (this container has no
network, no codec library, and no reference decoder), and the Kraft
check alone cannot catch a consistent mistranscription. The escape
tables 16-31 and the two repaired leaves therefore stay loud gates by
design, not as pending work.

* **The 512-coefficient synthesis window (Table B.3).** The window is
  a tabulated prototype lowpass with no closed form. This module
  substitutes a DESIGNED near-perfect-reconstruction PQMF prototype
  (Kaiser-windowed sinc, cutoff at the half-subband edge pi/64) wired
  into the spec's exact synthesis structure; the analysis window is
  derived from the same prototype, and the analysis->synthesis
  reconstruction error of the pair is pinned by test (better than
  -40 dB). On a real MP3 the substitute window differs from ISO's by
  a small spectral ripple; the structure, phases, and every other
  stage are the spec's.

MPEG-2 LSF (round 10): the low-sampling-frequency extension decodes
and encodes — 22.05/24/16 kHz, one 576-sample granule per frame,
8-bit main_data_begin, 9-bit scalefac_compress with the 4-partition
slen algorithm (preflag implied by the 500-511 row), no scfsi, LSF
band tables; validated by encoder/decoder roundtrip at all three
rates (long + short blocks) and by a REAL LAME-encoded MPEG-2 file on
this host decoding to its exact frame-quantized silence.
Intensity stereo (round 10): joint-stereo frames with
mode_extension bit0 decode — bands in the right channel's zero part
are position-coded, l = L*ratio/(1+ratio), r = L/(1+ratio) with
ratio = tan(is_pos*pi/12) (6 = all left, 7 = not intensity-coded; MS
rides along for the non-intensity bands when both flags are set) —
validated against an independent closed-form model of the mix.
MPEG-2.5, Huffman tables 16-31, and free-format
bitrate raise scoped NotImplementedError; truncated/corrupt input
raises ValueError (repo-wide corrupt-input contract).

Reference provenance: the reference repo has no audio path at all;
this extends the engine's multimodal column story
(operators/multimodal.py audio_features / audio_probe).
"""

from __future__ import annotations

import numpy as np

# --- constants -------------------------------------------------------------

BITRATES_V1L1 = (
    None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
    416, 448,
)
SAMPLE_RATES_V2 = (22050, 24000, 16000)
SAMPLE_RATES_V25 = (11025, 12000, 8000)
BITRATES_V2L3 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
BITRATES_V1L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)  # kbit/s, index 0 = free format (unsupported), 15 = invalid
SAMPLE_RATES_V1 = (44100, 48000, 32000)

# scalefac_compress -> (slen1, slen2) [ISO 11172-3 2.4.2.7]
SLEN = (
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
)

# preflag pretab, one entry per long scalefactor band [2.4.3.4.2.1]
PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

# --- Layer III Huffman tables [Table B.7] -----------------------------------
# Round 10: the bundled subset of the spec's big-values code tables —
# (xlen, linbits, codes row-major x*xlen+y, lengths). Public standard
# data (ISO/IEC 11172-3 Table B.7, reproduced in every Layer III
# implementation). Every bundled table is VALIDATED structurally at
# import: prefix-free and Kraft-complete (sum 2^-len == 1) — a
# transcription slip in the lengths cannot ship silently (garbage-
# without-erroring is the worst failure mode for a data pipeline).
# Tables 16-31 (the linbits escape tables, code tables 16 and 24) are
# NOT bundled: their transcriptions did not pass validation in this
# environment (no reference decoder exists here to cross-check
# against), so selecting them raises a loud NotImplementedError naming
# the table rather than risking silent mis-decode. Tables 10-13 and 15
# (round 10) DID pass: Kraft sum exactly 1, prefix-free, no duplicate
# codewords — 256-entry tables leave no slack for transcription slips.
HUFF_BIG: dict = {
    1: (2, 0, (1, 1, 1, 0), (1, 3, 2, 3)),
    2: (3, 0, (1, 2, 1, 3, 1, 1, 3, 2, 0), (1, 3, 6, 3, 3, 5, 5, 5, 6)),
    3: (3, 0, (3, 2, 1, 1, 1, 1, 3, 2, 0), (2, 2, 6, 3, 2, 5, 5, 5, 6)),
    5: (4, 0,
        (1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0),
        (1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8)),
    6: (4, 0,
        (7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0),
        (3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7)),
    7: (6, 0,
        (1, 2, 10, 19, 16, 10, 3, 3, 7, 10, 5, 3, 11, 4, 13, 17, 8, 4,
         12, 11, 18, 15, 11, 2, 7, 6, 9, 14, 3, 1, 6, 4, 5, 3, 2, 0),
        (1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8, 8, 9,
         7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8, 9, 10, 10, 10)),
    8: (6, 0,
        (3, 4, 6, 18, 12, 5, 5, 1, 2, 16, 9, 3, 7, 3, 5, 14, 7, 3,
         19, 17, 15, 13, 10, 4, 13, 5, 8, 11, 5, 1, 12, 4, 4, 1, 1, 0),
        (2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 6, 4, 6, 8, 8, 9,
         8, 8, 8, 9, 9, 10, 8, 7, 8, 9, 10, 10, 9, 8, 9, 9, 11, 11)),
    9: (6, 0,
        (7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7, 7, 6, 8, 8, 8, 5,
         15, 6, 9, 10, 5, 1, 11, 7, 9, 6, 4, 1, 14, 4, 6, 2, 6, 0),
        (3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6, 7, 8,
         6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7, 8, 8, 9, 9)),
    10: (8, 0,
        (1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7, 11, 9,
         15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7, 20, 19, 33,
         47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3, 14, 13, 10, 11, 16,
         6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0),
        (1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8, 6, 6, 7, 8, 9, 10,
         9, 9, 7, 7, 8, 9, 10, 10, 9, 10, 8, 8, 9, 10, 10, 10, 10, 10, 9, 9,
         10, 10, 11, 11, 10, 11, 8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10,
         10, 11, 11, 11)),
    11: (8, 0,
        (3, 4, 10, 24, 34, 33, 21, 15, 5, 3, 4, 10, 32, 17, 11, 10, 11, 7,
         13, 18, 30, 31, 20, 5, 25, 11, 19, 59, 27, 18, 12, 5, 35, 33, 31,
         58, 30, 16, 7, 5, 28, 26, 32, 19, 17, 15, 8, 14, 14, 12, 9, 13, 14,
         9, 4, 1, 11, 4, 6, 6, 6, 3, 2, 0),
        (2, 3, 5, 7, 8, 9, 8, 9, 3, 3, 4, 6, 8, 8, 7, 8, 5, 5, 6, 7, 8, 9,
         8, 8, 7, 6, 7, 9, 8, 10, 8, 9, 8, 8, 8, 9, 9, 10, 9, 10, 8, 8, 9,
         10, 10, 11, 10, 11, 8, 7, 7, 8, 9, 10, 10, 10, 8, 7, 8, 9, 10, 10,
         10, 10)),
    12: (8, 0,
        (9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11, 17, 7,
         11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5, 32, 13, 22,
         19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2, 27, 12, 11, 15, 10,
         7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0),
        (4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8, 5, 4, 5, 6, 7, 8,
         7, 8, 6, 5, 6, 6, 7, 8, 8, 8, 7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8,
         8, 9, 8, 9, 8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10)),
    13: (16, 0,
        (1, 5, 14, 21, 34, 51, 46, 71, 42, 52, 68, 52, 67, 44, 43, 19, 3, 4,
         12, 19, 31, 26, 44, 33, 31, 24, 32, 24, 31, 35, 22, 14, 15, 13, 23,
         36, 59, 49, 77, 65, 29, 40, 30, 40, 27, 33, 42, 16, 22, 20, 37, 61,
         56, 79, 73, 64, 43, 76, 56, 37, 26, 31, 25, 14, 35, 16, 60, 57, 97,
         75, 114, 91, 54, 73, 55, 41, 48, 53, 23, 24, 58, 27, 50, 96, 76,
         70, 93, 84, 77, 58, 79, 29, 74, 49, 41, 17, 47, 45, 78, 74, 115,
         94, 90, 79, 69, 83, 71, 50, 59, 38, 36, 15, 72, 34, 56, 95, 92, 85,
         91, 90, 86, 73, 77, 65, 51, 44, 43, 42, 43, 20, 30, 44, 55, 78, 72,
         87, 78, 61, 46, 54, 37, 30, 20, 16, 53, 25, 41, 37, 44, 59, 54, 81,
         66, 76, 57, 54, 37, 18, 39, 11, 35, 33, 31, 57, 42, 82, 72, 80, 47,
         58, 55, 21, 22, 26, 38, 22, 53, 25, 23, 38, 70, 60, 51, 36, 55, 26,
         34, 23, 27, 14, 9, 7, 34, 32, 28, 39, 49, 75, 30, 52, 48, 40, 52,
         28, 18, 17, 9, 5, 45, 21, 34, 64, 56, 50, 49, 45, 31, 19, 12, 15,
         10, 7, 6, 3, 48, 23, 20, 39, 36, 35, 53, 21, 16, 23, 13, 10, 6, 1,
         4, 2, 16, 15, 17, 27, 25, 20, 29, 11, 17, 12, 16, 8, 1, 1, 0, 1),
        (1, 4, 6, 7, 8, 9, 9, 10, 9, 10, 11, 11, 12, 12, 13, 13, 3, 4, 6, 7,
         8, 8, 9, 9, 9, 9, 10, 10, 11, 12, 12, 12, 6, 6, 7, 8, 9, 9, 10, 10,
         9, 10, 10, 11, 11, 12, 13, 13, 7, 7, 8, 9, 9, 10, 10, 10, 10, 11,
         11, 11, 11, 12, 13, 13, 8, 7, 9, 9, 10, 10, 11, 11, 10, 11, 11, 12,
         12, 13, 13, 14, 9, 8, 9, 10, 10, 10, 11, 11, 11, 11, 12, 11, 13,
         13, 14, 14, 9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 12, 12, 13, 13,
         14, 14, 10, 9, 10, 11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 14, 16,
         16, 9, 8, 9, 10, 10, 11, 11, 12, 12, 12, 12, 13, 13, 14, 15, 15,
         10, 9, 10, 10, 11, 11, 11, 13, 12, 13, 13, 14, 14, 14, 16, 15, 10,
         10, 10, 11, 11, 12, 12, 13, 12, 13, 14, 13, 14, 15, 16, 17, 11, 10,
         10, 11, 12, 12, 12, 12, 13, 13, 13, 14, 15, 15, 15, 16, 11, 11, 11,
         12, 12, 13, 12, 13, 14, 14, 15, 15, 15, 16, 16, 16, 12, 11, 12, 13,
         13, 13, 14, 14, 14, 14, 14, 15, 16, 15, 16, 16, 13, 12, 12, 13, 13,
         13, 15, 14, 14, 17, 15, 15, 15, 17, 16, 16, 12, 12, 13, 14, 14, 14,
         15, 14, 15, 15, 16, 16, 19, 18, 19, 16)),
    15: (16, 0,
        (7, 12, 18, 53, 47, 76, 124, 108, 89, 123, 108, 119, 107, 81, 122,
         63, 13, 5, 16, 27, 46, 36, 61, 51, 42, 70, 52, 83, 65, 41, 59, 36,
         19, 17, 15, 24, 41, 34, 59, 48, 40, 64, 50, 78, 62, 80, 56, 33, 29,
         28, 25, 43, 39, 63, 55, 93, 76, 59, 93, 72, 54, 75, 50, 29, 52, 22,
         42, 40, 67, 57, 95, 79, 72, 57, 89, 69, 49, 66, 46, 27, 77, 37, 35,
         66, 58, 52, 91, 74, 62, 48, 79, 63, 90, 62, 40, 38, 125, 32, 60,
         56, 50, 92, 78, 65, 55, 87, 71, 51, 73, 51, 70, 30, 109, 53, 49,
         94, 88, 75, 66, 122, 91, 73, 56, 42, 64, 44, 21, 25, 90, 43, 41,
         77, 73, 63, 56, 92, 77, 66, 47, 67, 48, 53, 36, 20, 71, 34, 67, 60,
         58, 49, 88, 76, 67, 106, 71, 54, 38, 39, 23, 15, 109, 53, 51, 47,
         90, 82, 58, 57, 48, 72, 57, 41, 23, 27, 62, 9, 86, 42, 40, 37, 70,
         64, 52, 43, 70, 55, 42, 25, 29, 18, 11, 11, 118, 68, 30, 55, 50,
         46, 74, 65, 49, 39, 24, 16, 22, 13, 14, 7, 91, 44, 39, 38, 34, 63,
         52, 45, 31, 52, 28, 19, 14, 8, 9, 3, 123, 60, 58, 53, 47, 43, 32,
         22, 37, 24, 17, 12, 15, 10, 2, 1, 71, 37, 34, 30, 28, 20, 17, 26,
         21, 16, 10, 6, 8, 6, 2, 0),
        (3, 4, 5, 7, 7, 8, 9, 9, 9, 10, 10, 11, 11, 11, 12, 13, 4, 3, 5, 6,
         7, 7, 8, 8, 8, 9, 9, 10, 10, 10, 11, 11, 5, 5, 5, 6, 7, 7, 8, 8, 8,
         9, 9, 10, 10, 11, 11, 11, 6, 6, 6, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10,
         11, 11, 11, 7, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
         8, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 11, 11, 11, 12, 9, 7, 8, 8,
         8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 12, 12, 9, 8, 8, 9, 9, 9, 9, 10,
         10, 10, 10, 10, 11, 11, 11, 12, 9, 8, 8, 9, 9, 9, 9, 10, 10, 10,
         10, 11, 11, 12, 12, 12, 9, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
         11, 12, 12, 12, 10, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11,
         12, 13, 12, 10, 9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12,
         12, 13, 11, 10, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 12, 12, 13,
         13, 11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13,
         12, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 12, 13, 12,
         11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13, 13, 13)),
}

# count1 table A [Table B.7]: 16 codes indexed by the (v w x y) bit
# pattern; table B is the fixed 4-bit one's-complement code (derivable,
# handled inline). Validated at import like HUFF_BIG.
COUNT1_A = (
    (1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1),
    (1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6),
)


def _validate_huffman(codes: tuple, lens: tuple, name: str) -> None:
    if abs(sum(2.0 ** -l for l in lens) - 1.0) > 1e-12:
        raise AssertionError(f"mp3 table {name}: Kraft sum != 1")
    pairs = sorted(zip(lens, codes))
    for i, (l1, c1) in enumerate(pairs):
        if c1 >= (1 << l1):
            raise AssertionError(f"mp3 table {name}: code overflow")
        for l2, c2 in pairs[i + 1:]:
            if (c2 >> (l2 - l1)) == c1:
                raise AssertionError(f"mp3 table {name}: prefix clash")


for _tid, (_xl, _lb, _hc, _hl) in HUFF_BIG.items():
    _validate_huffman(_hc, _hl, str(_tid))
_validate_huffman(COUNT1_A[0], COUNT1_A[1], "count1A")

# (length, code) -> symbol reverse maps, built once
_REV_BIG = {
    tid: {(l, c): i for i, (c, l) in enumerate(zip(hc, hl))}
    for tid, (_x, _lb, hc, hl) in HUFF_BIG.items()
}

# Round 11 (ADVICE r10): the two entries the round-10 validator
# REPAIRED rather than transcribed — t12 (1,7) (length 9->8) and
# t13 (15,15) (code forced by the other 255 entries). The repair is
# provably correct IF every other entry is right, but structural
# completeness can't rule out compensating transcription errors, and
# no independent transcription or reference decoder exists in this
# environment to cross-check. Decoding a stream that actually LANDS on
# one of these leaves therefore gates loudly instead of risking
# silent mis-decode; every other codeword of t12/t13 (matched by its
# own independently transcribed pattern) keeps decoding. The repo's
# encoder never selects t12/t13, so roundtrips are unaffected.
_REPAIRED_LEAVES = {12: {1 * 8 + 7}, 13: {15 * 16 + 15}}
_REV_C1A = {
    (l, c): i for i, (c, l) in enumerate(zip(COUNT1_A[0], COUNT1_A[1]))
}

# long-block scalefactor band boundaries (start index per band + 576 cap)
# per sampling rate [Table B.8]
SFB_LONG = {
    44100: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576),
    48000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576),
    32000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576),
    # MPEG-2 LSF rates (ISO 13818-3 Table B.2)
    22050: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576),
    24000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162,
            194, 232, 278, 332, 394, 464, 540, 576),
    16000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576),
    # MPEG-2.5 rates (the Fraunhofer LSF extension; tables as shipped
    # by every fielded decoder)
    11025: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576),
    12000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576),
    8000: (0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232, 280,
           336, 400, 476, 566, 568, 570, 572, 574, 576),
}

# alias-reduction butterfly coefficients [2.4.3.4.10.1]
_ALIAS_C = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                     -0.0142, -0.0037])
_ALIAS_CS = 1.0 / np.sqrt(1.0 + _ALIAS_C**2)
_ALIAS_CA = _ALIAS_C * _ALIAS_CS


class Mp3Error(ValueError):
    pass


# --- bit reader ------------------------------------------------------------


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        d, p = self.data, self.pos
        if (p + n) > 8 * len(d):
            raise Mp3Error("mp3: bitstream exhausted (truncated main data)")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v


# --- filterbank prototype (designed; see module docstring) -----------------


def _prototype() -> np.ndarray:
    """512-tap near-PR PQMF prototype, designed (ISO Table B.3 is
    non-derivable lookup data — module docstring): the magnitude
    response is a power-complementary raised-cosine transition centered
    on the half-subband edge pi/64 (cos^2 rolloff over [wc(1-t),
    wc(1+t)], t=1.05 — adjacent-band alias terms cancel by
    construction, |H(w)|^2 + |H(pi/32 - w)|^2 ~= 1), sampled on a 16k
    grid with a half-sample-delay linear phase and inverse-FFT'd to the
    512-tap window. Reconstruction of the analysis+synthesis pair
    measures -43 dB (pinned by test, >= 40 dB asserted). Deterministic."""
    nf = 16384
    w = np.linspace(0.0, np.pi, nf // 2 + 1)
    wc = np.pi / 64.0
    trans = 1.05
    wp, ws = wc * (1 - trans), wc * (1 + trans)
    p = np.zeros_like(w)
    p[w <= wp] = 1.0
    mid = (w > wp) & (w < ws)
    p[mid] = np.cos(np.pi / 2 * (w[mid] - wp) / (ws - wp)) ** 2
    h = np.fft.irfft(np.sqrt(p) * np.exp(-1j * w * 255.5), nf)[:512]
    return h / h.sum()


_G = _prototype()
# spec C/D layout: the prototype enters the window tables with the sign
# of every second 64-block flipped (the U-mapping of figure 3-A.2
# un-flips it); validated by the analysis->synthesis SNR test
_SIGN64 = np.where((np.arange(512) // 64) % 2 == 0, 1.0, -1.0)
_C_WINDOW = _G * _SIGN64          # analysis window (Z[i] = C[i] * X[i])
_D_WINDOW = _G * _SIGN64 * 32.0   # synthesis window (W[i] = D[i] * U[i])

# synthesis matrixing  V[i] = sum_k cos((16+i)(2k+1) pi/64) S[k]
_N_SYN = np.cos(
    (16.0 + np.arange(64)[:, None]) * (2.0 * np.arange(32)[None, :] + 1.0)
    * np.pi / 64.0
)
# analysis matrixing  S[k] = sum_i cos((2k+1)(i-16) pi/64) Y[i]
_M_ANA = np.cos(
    (2.0 * np.arange(32)[:, None] + 1.0) * (np.arange(64)[None, :] - 16.0)
    * np.pi / 64.0
)

def _unity_scale() -> float:
    """Deterministic import-time calibration of the analysis+synthesis
    passband gain (a designed prototype has no tabulated gain the way
    ISO's does): a short 1 kHz sine probe through both filterbanks,
    least-squares gain at the known 481-sample delay. _D_WINDOW divides
    by this so the decode chain is unity-gain end to end."""
    t = np.arange(32 * 40, dtype=np.float64) / 44100.0
    x = np.sin(2 * np.pi * 1000.0 * t)
    fifo = np.zeros(512)
    v = np.zeros(1024)
    y = np.empty_like(x)
    cw = _G * _SIGN64
    dw = _G * _SIGN64 * 32.0
    for step in range(len(x) // 32):
        fifo = np.roll(fifo, 32)
        fifo[:32] = x[step * 32: step * 32 + 32][::-1]
        s = _M_ANA @ (fifo * cw).reshape(8, 64).sum(axis=0)
        v = np.roll(v, 64)
        v[:64] = _N_SYN @ s
        u = np.empty(512)
        for i in range(8):
            u[i * 64: i * 64 + 32] = v[i * 128: i * 128 + 32]
            u[i * 64 + 32: i * 64 + 64] = v[i * 128 + 96: i * 128 + 128]
        y[step * 32: step * 32 + 32] = (u * dw).reshape(16, 32).sum(axis=0)
    xa = x[600: len(x) - 481]
    ya = y[600 + 481:]
    return float(np.dot(xa, ya) / np.dot(xa, xa))


_D_WINDOW = _D_WINDOW / _unity_scale()  # unity-gain decode chain

# IMDCT-36 basis  x[n] = sum_k X[k] cos(pi/72 (2n+1+18)(2k+1))
_IMDCT36 = np.cos(
    np.pi / 72.0
    * (2.0 * np.arange(36)[:, None] + 1.0 + 18.0)
    * (2.0 * np.arange(18)[None, :] + 1.0)
)
_WIN_LONG = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))

# short-block windows and transforms (round 9) [2.4.3.4.10.2/3]
_WIN_SHORT = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
# block_type 1 (start): long rise, flat, short fall, zero tail
_WIN_START = np.concatenate([
    _WIN_LONG[:18], np.ones(6),
    np.sin(np.pi / 12.0 * (np.arange(6) + 6 + 0.5)), np.zeros(6),
])
# block_type 3 (stop): zero head, short rise, flat, long fall
_WIN_STOP = np.concatenate([
    np.zeros(6), np.sin(np.pi / 12.0 * (np.arange(6) + 0.5)),
    np.ones(6), _WIN_LONG[18:],
])
_IMDCT12 = np.cos(
    np.pi / 24.0
    * np.outer(2 * np.arange(12) + 1 + 6, 2 * np.arange(6) + 1)
)

# short-block scalefactor band boundaries per window (13 bands) per
# sampling rate [Table B.8]
SFB_SHORT = {
    44100: (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000: (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000: (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
    # MPEG-2 LSF rates (ISO 13818-3 Table B.2)
    22050: (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    24000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    16000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    # MPEG-2.5 rates
    11025: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    12000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    8000: (0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192),
}


# --- header / side info ----------------------------------------------------


def _skip_id3(data: bytes) -> int:
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | (
            (data[8] & 0x7F) << 7
        ) | (data[9] & 0x7F)
        return 10 + size
    return 0


def _parse_header(h: bytes, free_len: int | None = None) -> dict:
    """4 header bytes -> field dict; raises on unsupported variants.
    Free-format streams (bitrate_index 0) carry no bitrate — the
    caller measures the constant frame length from the distance
    between syncwords and passes it as `free_len` (round 10)."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        raise Mp3Error("mp3: lost frame sync")
    version = (h[1] >> 3) & 3
    layer = (h[1] >> 1) & 3
    if version == 1:
        raise Mp3Error("mp3: reserved version bits")
    lsf = version != 3  # MPEG-2 / MPEG-2.5: low-sampling-frequency
    if layer == 0:
        raise Mp3Error("mp3: reserved layer bits")
    if layer == 2:  # '10' = Layer II
        raise NotImplementedError(
            "mp3: Layer II is not supported (Layers I and III are)"
        )
    layer1 = layer == 3  # '11' = Layer I (round 10)
    if layer1 and lsf:
        raise NotImplementedError("mp3: LSF Layer I not supported")
    protection = h[1] & 1  # 0 = CRC present
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 3
    if br_idx == 0 and free_len is None:
        raise NotImplementedError(
            "mp3: free-format bitrate needs a sync-derived frame length"
        )
    if br_idx == 15 or sr_idx == 3:
        raise Mp3Error("mp3: invalid bitrate/samplerate index")
    padding = (h[2] >> 1) & 1
    mode = (h[3] >> 6) & 3
    mode_ext = (h[3] >> 4) & 3
    # modes: 0 stereo, 1 joint stereo, 2 dual channel, 3 single channel.
    # Joint stereo's mode_extension: bit1 = MS stereo, bit0 = intensity
    # stereo (round 10: position coding over tan(is_pos*pi/12)).
    nch = 1 if mode == 3 else 2
    if layer1:
        if br_idx == 0:
            raise NotImplementedError("mp3: free-format Layer I")
        if mode == 1:
            raise NotImplementedError(
                "mp3: Layer I intensity (bound) mode not supported"
            )
        bitrate = BITRATES_V1L1[br_idx] * 1000
        rate = SAMPLE_RATES_V1[sr_idx]
        return {
            "bitrate": bitrate, "rate": rate, "padding": padding,
            "crc": protection == 0,
            "frame_len": (12 * bitrate // rate + padding) * 4,
            "nch": nch, "lsf": False, "layer1": True,
            "ms_stereo": False, "intensity": False,
        }
    if lsf:
        rate = (SAMPLE_RATES_V25 if version == 0 else SAMPLE_RATES_V2)[
            sr_idx
        ]
        if br_idx == 0:
            frame_len = free_len + padding
            bitrate = free_len * rate // 72
        else:
            bitrate = BITRATES_V2L3[br_idx] * 1000
            # LSF frames carry ONE granule (576 samples): half the slots
            frame_len = 72 * bitrate // rate + padding
    else:
        rate = SAMPLE_RATES_V1[sr_idx]
        if br_idx == 0:
            frame_len = free_len + padding
            bitrate = free_len * rate // 144
        else:
            bitrate = BITRATES_V1L3[br_idx] * 1000
            frame_len = 144 * bitrate // rate + padding
    return {
        "bitrate": bitrate,
        "rate": rate,
        "padding": padding,
        "crc": protection == 0,
        "frame_len": frame_len,
        "nch": nch,
        "lsf": lsf,
        "ms_stereo": mode == 1 and bool(mode_ext & 2),
        "intensity": mode == 1 and bool(mode_ext & 1),
        "layer1": False,
    }


def _parse_side_info(raw: bytes, nch: int = 1, lsf: bool = False) -> dict:
    """Side info -> dict. MPEG-1: 17 bytes mono / 32 stereo, 9-bit
    main_data_begin, scfsi, TWO granules. MPEG-2 LSF: 9 / 17 bytes,
    8-bit main_data_begin, no scfsi, ONE granule (and a 9-bit
    scalefac_compress inside the granule). ``granules`` is
    [granule][channel] in wire order; ``scfsi`` is per channel (all
    zeros for LSF — the reuse mechanism does not exist there)."""
    b = _Bits(raw)
    if lsf:
        si = {
            "main_data_begin": b.read(8),
            "private": b.read(1 if nch == 1 else 2),
            "scfsi": [[0] * 4 for _ in range(nch)],
            "granules": [[_parse_granule(b, lsf=True) for _ in range(nch)]],
        }
        return si
    si = {
        "main_data_begin": b.read(9),
        "private": b.read(5 if nch == 1 else 3),
        "scfsi": [[b.read(1) for _ in range(4)] for _ in range(nch)],
        "granules": [],
    }
    for _gr in range(2):
        si["granules"].append([_parse_granule(b) for _ in range(nch)])
    return si


def _parse_granule(b: _Bits, lsf: bool = False) -> dict:
    g = {
        "part2_3_length": b.read(12),
        "big_values": b.read(9),
        "global_gain": b.read(8),
        "scalefac_compress": b.read(9 if lsf else 4),
        "window_switching": b.read(1),
        "lsf": lsf,
    }
    if g["window_switching"]:
        g["block_type"] = b.read(2)
        if g["block_type"] == 0:
            raise Mp3Error("mp3: window_switching with block_type 0 is invalid")
        g["mixed_block"] = b.read(1)
        g["table_select"] = [b.read(5) for _ in range(2)]
        g["subblock_gain"] = [b.read(3) for _ in range(3)]
        # spec-fixed region split for switched granules: region0 ends
        # at spectral line 36 in every case (long sfb[8] for start/
        # stop/mixed with region0_count=7; short sfb[3]*3 for pure
        # short with region0_count=8), region1 covers the rest
        g["region0_count"] = (
            8 if g["block_type"] == 2 and not g["mixed_block"] else 7
        )
        g["region1_count"] = 36
    else:
        g["block_type"] = 0
        g["mixed_block"] = 0
        g["table_select"] = [b.read(5) for _ in range(3)]
        g["region0_count"] = b.read(4)
        g["region1_count"] = b.read(3)
    # LSF granules carry no preflag bit: it is implied by the
    # scalefac_compress row (set during scalefactor decode)
    g["preflag"] = 0 if lsf else b.read(1)
    g["scalefac_scale"] = b.read(1)
    g["count1table_select"] = b.read(1)
    return g


# --- granule decode --------------------------------------------------------


# LSF scalefactor partitioning (ISO 13818-3 §2.4.3.2): the 9-bit
# scalefac_compress selects a (slen[4], nsfb-row) pair; rows are
# (long, short, mixed) scalefactor COUNTS per partition. Rows 0-2
# cover the non-intensity case (intensity stereo is gated upstream).
_LSF_NSFB = (
    ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
)


def _decode_scalefactors_lsf(bits: _Bits, g: dict):
    """MPEG-2 LSF scalefactors: 4 partitions of (count, width) derived
    from the 9-bit scalefac_compress; sets g['preflag'] for the
    500..512 row. Returns (sf_long, sf_short) like the MPEG-1 path."""
    sfc = g["scalefac_compress"]
    if sfc < 400:
        slen = ((sfc >> 4) // 5, (sfc >> 4) % 5, (sfc % 16) >> 2, sfc % 4)
        row = 0
    elif sfc < 500:
        c = sfc - 400
        slen = ((c >> 2) // 5, (c >> 2) % 5, c % 4, 0)
        row = 1
    else:
        c = sfc - 500
        slen = (c // 3, c % 3, 0, 0)
        row = 2
        g["preflag"] = 1
    short = g["block_type"] == 2 and not g.get("mixed_block", 0)
    mixed = g["block_type"] == 2 and g.get("mixed_block", 0)
    nsfb = _LSF_NSFB[row][1 if short else 2 if mixed else 0]
    vals: list = []
    for n, width in zip(nsfb, slen):
        for _ in range(n):
            vals.append(bits.read(width) if width else 0)
    if g["block_type"] != 2:
        sf = (vals + [0] * 21)[:21]
        return sf, None
    sfs = [[0] * 3 for _ in range(13)]
    if mixed:  # 6 long bands (lines 0-35 at LSF rates), short 3..11
        sf = [0] * 21
        sf[:6] = vals[:6]
        it = iter(vals[6:])
        for band in range(3, 12):
            for w in range(3):
                sfs[band][w] = next(it, 0)
        return sf, sfs
    it = iter(vals)
    for band in range(12):
        for w in range(3):
            sfs[band][w] = next(it, 0)
    return None, sfs


def _decode_scalefactors(bits: _Bits, g: dict, prev_sf, scfsi):
    """Scalefactors. Long blocks: 21 bands with scfsi group reuse from
    granule 0 where flagged. Short blocks: 12 bands x 3 windows (scfsi
    never applies, per the spec encoders must clear it for short).
    Mixed: 8 long bands then short bands 3-11. Returns (sf_long,
    sf_short) — the unused member is None for pure long/short."""
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    if g["block_type"] == 2 and not g["mixed_block"]:
        sfs = [[0] * 3 for _ in range(13)]
        for band in range(12):
            slen = slen1 if band < 6 else slen2
            for w in range(3):
                sfs[band][w] = bits.read(slen) if slen else 0
        return None, sfs
    if g["block_type"] == 2:  # mixed: 8 long bands + short bands 3..11
        sf = [0] * 21
        for band in range(8):
            sf[band] = bits.read(slen1) if slen1 else 0
        sfs = [[0] * 3 for _ in range(13)]
        for band in range(3, 12):
            slen = slen1 if band < 6 else slen2
            for w in range(3):
                sfs[band][w] = bits.read(slen) if slen else 0
        return sf, sfs
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
    sf = [0] * 21
    for gi, (lo, hi, slen) in enumerate(groups):
        if prev_sf is not None and scfsi[gi]:
            sf[lo:hi] = prev_sf[lo:hi]  # no bits read
        else:
            for i in range(lo, hi):
                sf[i] = bits.read(slen) if slen else 0
    return sf, None


def _huff_symbol(bits: _Bits, rev: dict, end_bit: int, name: str) -> int:
    """Read one variable-length codeword (MSB-first) via a (len, code)
    reverse map. Max Layer III code length is 19 bits."""
    code = 0
    for ln in range(1, 20):
        if bits.pos >= end_bit:
            raise Mp3Error(f"mp3: Huffman code ({name}) past part2_3_length")
        code = (code << 1) | bits.read(1)
        sym = rev.get((ln, code))
        if sym is not None:
            return sym
    raise Mp3Error(f"mp3: invalid Huffman code ({name})")


def _decode_huffman(bits: _Bits, g: dict, sfb: tuple, end_bit: int) -> np.ndarray:
    """Spectral integer values for one granule. Bundled entropy
    subset (round 10): big-values tables 0-3, 5-13 and 15 (validated
    transcriptions of Table B.7) and BOTH count1 tables; the unbundled
    linbits escape tables (16-31) raise naming the table (see module
    docstring)."""
    iv = np.zeros(576, dtype=np.float64)
    big = 2 * g["big_values"]
    if big > 576:
        raise Mp3Error(f"mp3: big_values {g['big_values']} exceeds 288")
    if g.get("window_switching", 0):
        # spec-fixed split: region0 = first 36 lines, region1 = rest
        r0_end, r1_end = 36, 576
    else:
        # region0_count+1 bands, then region1_count+1 more, rest region 2
        r0_end = sfb[min(g["region0_count"] + 1, len(sfb) - 1)]
        r1_end = sfb[
            min(g["region0_count"] + 1 + g["region1_count"] + 1, len(sfb) - 1)
        ]
    regions = ((0, min(r0_end, big)), (min(r0_end, big), min(r1_end, big)),
               (min(r1_end, big), big))
    for ridx, (lo, hi) in enumerate(regions):
        if hi <= lo:
            continue
        # window-switching granules carry 2 table_selects; their region
        # 2 is empty by construction (r1_end = 576), so ridx <= 1 there
        table = g["table_select"][ridx]
        if table == 0:
            continue  # table 0: region decodes to zeros, no bits read
        if table in (4, 14):
            raise Mp3Error(f"mp3: reserved Huffman table {table}")
        if table not in HUFF_BIG:
            raise NotImplementedError(
                f"mp3: Layer III big-values Huffman table {table} not "
                "bundled (validated subset is 0-3, 5-13 and 15; the "
                "linbits escape tables 16-31 await a cross-checkable "
                "transcription)"
            )
        xlen, linbits, _hc, _hl = HUFF_BIG[table]
        rev = _REV_BIG[table]
        repaired = _REPAIRED_LEAVES.get(table, ())
        for pos in range(lo, hi, 2):
            sym = _huff_symbol(bits, rev, end_bit, f"table {table}")
            if sym in repaired:
                raise NotImplementedError(
                    f"mp3: table {table} codeword {divmod(sym, xlen)} "
                    "was validator-REPAIRED, not transcribed; decoding "
                    "through it awaits an independent cross-check "
                    "(ADVICE r10)"
                )
            x, y = divmod(sym, xlen)
            if x == 15 and linbits:
                x += bits.read(linbits)
            if x:
                iv[pos] = -float(x) if bits.read(1) else float(x)
            if y == 15 and linbits:
                y += bits.read(linbits)
            if y:
                iv[pos + 1] = -float(y) if bits.read(1) else float(y)
    # count1 region: quadruples until the granule's bits run out
    idx = big
    if g["count1table_select"] == 0:
        while bits.pos < end_bit and idx <= 572:
            q = _huff_symbol(bits, _REV_C1A, end_bit, "count1 A")
            for j, bit in enumerate(
                (q >> 3 & 1, q >> 2 & 1, q >> 1 & 1, q & 1)
            ):
                if bit:
                    if bits.pos >= end_bit:
                        raise Mp3Error(
                            "mp3: count1 sign bit past part2_3_length"
                        )
                    iv[idx + j] = -1.0 if bits.read(1) else 1.0
            idx += 4
        if bits.pos > end_bit:
            raise Mp3Error("mp3: Huffman data overran part2_3_length")
        return iv
    # count1 table B: 4 bits = one's complement of (v w x y), then one
    # sign bit per nonzero value (1 = negative)
    while bits.pos < end_bit and idx <= 572:
        q = bits.read(4) ^ 0xF
        for j, bit in enumerate((q >> 3 & 1, q >> 2 & 1, q >> 1 & 1, q & 1)):
            if bit:
                if bits.pos >= end_bit:
                    raise Mp3Error("mp3: count1 sign bit past part2_3_length")
                iv[idx + j] = -1.0 if bits.read(1) else 1.0
        idx += 4
    if bits.pos > end_bit:
        raise Mp3Error("mp3: Huffman data overran part2_3_length")
    return iv


def _apply_joint_stereo(
    xl: np.ndarray,
    xr: np.ndarray,
    g_r: dict,
    sf_r,
    sfs_r,
    sfb: tuple,
    sfb_s: tuple,
    ms_on: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Intensity stereo [2.4.3.4.9.3], applied in the DECODED
    (pre-reorder) domain where the right channel's zero part is a
    contiguous tail: scalefactor bands starting at or after the right
    channel's last nonzero line are intensity-coded — the RIGHT
    granule's 'scalefactors' there are is_pos values, and
    l = L*ratio/(1+ratio), r = L/(1+ratio) with
    ratio = tan(is_pos*pi/12) (is_pos 6 -> all left; 7 -> band NOT
    intensity-coded). Bands below the bound (and is_pos-7 bands) use
    the MS matrix when mode_extension also sets it, else pass through.
    The top band (21 long / 12 short) reuses the last transmitted
    position, per the spec."""
    nz = np.flatnonzero(xr)
    zero_bound = int(nz[-1]) + 1 if len(nz) else 0
    out_l, out_r = xl.copy(), xr.copy()
    r2 = np.sqrt(2.0)

    def stereo_seg(lo, hi, is_pos):
        if lo >= hi:
            return
        if is_pos is not None and is_pos != 7:
            left = out_l[lo:hi].copy()
            if is_pos == 6:
                out_l[lo:hi] = left
                out_r[lo:hi] = 0.0
            else:
                ratio = np.tan(is_pos * np.pi / 12.0)
                out_l[lo:hi] = left * (ratio / (1.0 + ratio))
                out_r[lo:hi] = left * (1.0 / (1.0 + ratio))
        elif ms_on:
            m = out_l[lo:hi].copy()
            sd = out_r[lo:hi].copy()
            out_l[lo:hi] = (m + sd) / r2
            out_r[lo:hi] = (m - sd) / r2

    short = g_r.get("block_type", 0) == 2
    mixed = bool(g_r.get("mixed_block", 0))
    if not short or mixed:
        n_long = sfb.index(36) if short else len(sfb) - 1
        for band in range(n_long):
            lo, hi = sfb[band], sfb[band + 1]
            ip = sf_r[min(band, 20)] if lo >= zero_bound else None
            stereo_seg(lo, hi, ip)
        if not short:
            # lines past the last long band (none at MPEG-1 rates where
            # the table reaches 576; defensive for exotic tables)
            if sfb[-1] < 576:
                ip = sf_r[20] if sfb[-1] >= zero_bound else None
                stereo_seg(sfb[-1], 576, ip)
            return out_l, out_r
    first_band = 3 if mixed else 0
    for band in range(first_band, len(sfb_s) - 1):
        width = sfb_s[band + 1] - sfb_s[band]
        base = 3 * sfb_s[band]
        for w in range(3):
            lo = base + w * width
            ip = (
                sfs_r[min(band, 11)][w] if lo >= zero_bound else None
            )
            stereo_seg(lo, lo + width, ip)
    return out_l, out_r


def _requantize(
    iv: np.ndarray,
    g: dict,
    sf: list[int] | None,
    sfb: tuple,
    sfs=None,
    sfb_s: tuple | None = None,
) -> np.ndarray:
    """iv -> real spectral values xr [2.4.3.4.7.1]. Long blocks scale
    per long band (preflag/pretab applies); short blocks scale per
    (band, window) in the DECODED (band-major) order with the window's
    subblock_gain; mixed granules apply the long rule to lines 0-35
    and the short rule from band 3 up."""
    gain = 2.0 ** (0.25 * (g["global_gain"] - 210))
    xr = np.sign(iv) * np.abs(iv) ** (4.0 / 3.0) * gain
    step = 1.0 if g["scalefac_scale"] else 0.5
    short = g.get("block_type", 0) == 2
    if not short or g.get("mixed_block", 0):
        # mixed: the long rule covers lines 0-35 — 8 bands at MPEG-1
        # rates, 6 at LSF rates; the table itself says where 36 falls
        n_long = sfb.index(36) if short else len(sfb) - 1
        for band in range(n_long):
            s = sf[band] if band < len(sf) else 0
            if g["preflag"]:
                s += PRETAB[band]
            if s:
                xr[sfb[band]: sfb[band + 1]] *= 2.0 ** (-step * s)
        if not short:
            return xr
    first_band = 3 if g.get("mixed_block", 0) else 0
    sbg = g["subblock_gain"]
    for band in range(first_band, len(sfb_s) - 1):
        width = sfb_s[band + 1] - sfb_s[band]
        base = 3 * sfb_s[band]
        for w in range(3):
            s = sfs[band][w] if band < len(sfs) else 0
            factor = 2.0 ** (-2.0 * sbg[w] - step * s)
            if factor != 1.0:
                lo = base + w * width
                xr[lo: lo + width] *= factor
    return xr


def _reorder_short(xr: np.ndarray, sfb_s: tuple, mixed: bool) -> np.ndarray:
    """Short-block reorder [2.4.3.4.8]: Huffman-decoded order is
    (scalefactor band, window, line); the filterbank wants each
    subband's 18 lines as (window, line-within-window) — global
    frequency line k of window w lands at (k//6)*18 + w*6 + k%6.
    Mixed granules keep lines 0-35 (the 2 long subbands) in place and
    reorder from short band 3 (line 36) up."""
    out = xr.copy()
    first_band = 3 if mixed else 0
    for band in range(first_band, len(sfb_s) - 1):
        width = sfb_s[band + 1] - sfb_s[band]
        base = 3 * sfb_s[band]
        for w in range(3):
            for i in range(width):
                k = sfb_s[band] + i
                out[(k // 6) * 18 + w * 6 + (k % 6)] = xr[base + w * width + i]
    return out


def _alias_reduce(
    xr: np.ndarray, inverse: bool = False, n_sb: int = 32
) -> np.ndarray:
    """8 butterflies across each adjacent-subband boundary. The decoder
    direction is the spec's; inverse=True applies the transpose (used by
    the fixture encoder). Long granules reduce all 31 boundaries; a
    MIXED granule only the boundary between its two long subbands
    (n_sb=2); pure short granules skip aliasing entirely."""
    out = xr.copy()
    for sb in range(1, n_sb):
        base = sb * 18
        for i in range(8):
            a = out[base - 1 - i]
            b = out[base + i]
            cs, ca = _ALIAS_CS[i], _ALIAS_CA[i]
            if not inverse:
                out[base - 1 - i] = a * cs - b * ca
                out[base + i] = b * cs + a * ca
            else:
                out[base - 1 - i] = a * cs + b * ca
                out[base + i] = b * cs - a * ca
    return out


def _imdct_short_sb(x18: np.ndarray) -> np.ndarray:
    """One subband's short-block hybrid synthesis: three 12-point
    IMDCTs (lines window-major: w*6+i), each windowed by the short sine
    window and overlap-assembled at 6-sample hops into the 36-sample
    output frame [2.4.3.4.10.2]."""
    x36 = np.zeros(36)
    for w in range(3):
        x12 = (_IMDCT12 @ x18[w * 6: w * 6 + 6]) * _WIN_SHORT
        x36[6 + 6 * w: 18 + 6 * w] += x12
    return x36


_WINDOWS_BY_TYPE = {0: _WIN_LONG, 1: _WIN_START, 3: _WIN_STOP}


def _imdct_granule(
    xr: np.ndarray, overlap: np.ndarray, g: dict | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Hybrid IMDCT per subband + overlap-add, window per the granule's
    block_type (long / start / stop / short, mixed = 2 long subbands +
    30 short ones).

    Returns (subband_samples[18,32], new_overlap[32,18])."""
    bt = 0 if g is None else g.get("block_type", 0)
    mixed = 0 if g is None else g.get("mixed_block", 0)
    X = xr.reshape(32, 18)
    out = np.empty((18, 32))
    new_overlap = np.empty((32, 18))
    for sb in range(32):
        if bt == 2 and (not mixed or sb >= 2):
            x36 = _imdct_short_sb(X[sb])
        else:
            win = _WINDOWS_BY_TYPE[0 if (bt == 2 and mixed) else bt]
            x36 = (_IMDCT36 @ X[sb]) * win
        out[:, sb] = x36[:18] + overlap[sb]
        new_overlap[sb] = x36[18:]
    # frequency inversion: odd subbands, odd time samples
    out[1::2, 1::2] *= -1.0
    return out, new_overlap


class _Synth:
    """Spec synthesis filterbank (figure 3-A.2) with the designed D."""

    def __init__(self):
        self.v = np.zeros(1024)

    def step(self, s: np.ndarray) -> np.ndarray:
        self.v = np.roll(self.v, 64)
        self.v[:64] = _N_SYN @ s
        u = np.empty(512)
        for i in range(8):
            u[i * 64: i * 64 + 32] = self.v[i * 128: i * 128 + 32]
            u[i * 64 + 32: i * 64 + 64] = self.v[i * 128 + 96: i * 128 + 128]
        w = u * _D_WINDOW
        return w.reshape(16, 32).sum(axis=0)


# --- the decoder -----------------------------------------------------------


def _measure_free_format(content: bytes, pos: int) -> int:
    """Free-format streams: the frame length (without the padding
    slot) is the distance between the first two syncwords whose
    version/layer/rate/mode fields MATCH the first header — Huffman
    payload can contain 0xFF bytes, so every candidate is verified
    against the next expected sync too [ISO 11172-3 §2.4.2.3]."""
    h0 = content[pos: pos + 4]
    pad0 = (h0[2] >> 1) & 1
    key = (h0[1], h0[2] & 0x0C, h0[3] & 0xC0)
    for cand in range(pos + 21, min(pos + 5761, len(content) - 4)):
        c = content[cand: cand + 4]
        if c[0] != 0xFF or (c[1] & 0xE0) != 0xE0:
            continue
        if (c[1], c[2] & 0x0C, c[3] & 0xC0) != key:
            continue
        flen = (cand - pos) - pad0  # padding belongs to frame 0
        # double-check: the sync after the CANDIDATE frame also lands
        pad1 = (c[2] >> 1) & 1
        nxt = cand + flen + pad1
        if nxt + 2 <= len(content):
            if content[nxt] != 0xFF or (content[nxt + 1] & 0xE0) != 0xE0:
                continue
        return flen
    raise Mp3Error("mp3: free-format stream: no second syncword found")


# Layer I/II scalefactor table [Table B.1]: 2.0 * 2^(-idx/3)
_L1_SCF = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))


def _decode_layer1_frame(frame: bytes, hdr: dict, synths: list):
    """One Layer I frame -> [384, nch] PCM through the shared synthesis
    filterbank [2.4.1.5/2.4.2.5]: 4-bit allocation per subband (nb =
    alloc + 1 bits, 2..15), 6-bit scalefactor per allocated subband,
    then 12 sample rows; requantize
    s = ((2x + 1 - 2^nb) / 2^nb) * (2^nb / (2^nb - 1)) * scf."""
    nch = hdr["nch"]
    off = 4 + (2 if hdr["crc"] else 0)
    bits = _Bits(frame[off:])
    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            a = bits.read(4)
            if a == 15:
                raise Mp3Error("mp3: Layer I allocation 15 is forbidden")
            alloc[ch][sb] = a
    scf = [[0.0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                scf[ch][sb] = _L1_SCF[bits.read(6)]
    out = []
    rows = [np.zeros((12, 32)) for _ in range(nch)]
    for t in range(12):
        for sb in range(32):
            for ch in range(nch):
                a = alloc[ch][sb]
                if not a:
                    continue
                nb = a + 1
                x = bits.read(nb)
                frac = (2.0 * x + 1.0 - 2.0 ** nb) / 2.0 ** nb
                rows[ch][t, sb] = (
                    frac * (2.0 ** nb / (2.0 ** nb - 1.0)) * scf[ch][sb]
                )
    for t in range(12):
        if nch == 1:
            out.append(synths[0].step(rows[0][t]))
        else:
            out.append(np.stack(
                [synths[ch].step(rows[ch][t]) for ch in range(nch)],
                axis=1,
            ))
    return out


def encode_layer1(
    pcm: np.ndarray, rate: int = 44100, bitrate: int = 256_000
) -> bytes:
    """Float PCM -> MPEG-1 Layer I frames (fixture encoder, mono or
    stereo): per frame, per-subband scalefactors from the 12-row max
    and a uniform 11-bit allocation where the budget allows (dropped
    subband-by-subband from the top until the frame fits)."""
    if rate not in SAMPLE_RATES_V1:
        raise Mp3Error(f"mp3: unsupported sample rate {rate}")
    try:
        br_idx = BITRATES_V1L1.index(bitrate // 1000)
    except ValueError:
        raise Mp3Error(f"mp3: unsupported Layer I bitrate {bitrate}")
    frame_len = (12 * bitrate // rate) * 4
    pcm = np.asarray(pcm, dtype=np.float64)
    nch = 2 if pcm.ndim == 2 else 1
    n = pcm.shape[0]
    n_frames = max(1, -(-n // 384))
    chans = []
    for ch in range(nch):
        x = np.zeros(n_frames * 384)
        x[:n] = pcm[:, ch] if nch == 2 else pcm
        chans.append(_analysis(x))  # [n_frames*12, 32]
    mode_byte = (3 if nch == 1 else 0) << 6
    hdr = bytes([
        0xFF, 0xE0 | (3 << 3) | (3 << 1) | 1,  # MPEG-1, Layer I, no CRC
        (br_idx << 4) | (SAMPLE_RATES_V1.index(rate) << 2),
        mode_byte,
    ])
    nb = 11  # uniform allocation; alloc code = nb - 1
    # budget check: header + alloc + scf + samples must fit the frame
    need = 4 + (32 * 4 * nch + 32 * 6 * nch + 12 * 32 * nb * nch + 7) // 8
    n_sb = 32
    while need > frame_len and n_sb > 1:
        n_sb -= 1
        need = 4 + (
            32 * 4 * nch + n_sb * 6 * nch + 12 * n_sb * nb * nch + 7
        ) // 8
    if need > frame_len:
        raise Mp3Error("mp3: Layer I frame does not fit — raise bitrate")
    out = bytearray()
    for f in range(n_frames):
        rows = [c[f * 12: (f + 1) * 12] for c in chans]
        scf_idx = [[0] * 32 for _ in range(nch)]
        scf_val = [[0.0] * 32 for _ in range(nch)]
        for ch in range(nch):
            for sb in range(n_sb):
                m = float(np.abs(rows[ch][:, sb]).max())
                idx = 62
                for i in range(63):
                    if _L1_SCF[i] >= m or abs(_L1_SCF[i] - m) < 1e-12:
                        idx = i
                    else:
                        break
                scf_idx[ch][sb] = idx
                scf_val[ch][sb] = _L1_SCF[idx]
        w = _BitWriter()
        for sb in range(32):
            for ch in range(nch):
                w.write(nb - 1 if sb < n_sb else 0, 4)
        for sb in range(n_sb):
            for ch in range(nch):
                w.write(scf_idx[ch][sb], 6)
        steps = 2 ** nb
        for t in range(12):
            for sb in range(n_sb):
                for ch in range(nch):
                    v = rows[ch][t, sb] / scf_val[ch][sb]
                    # invert the decode mapping: x = round((s*(2^nb-1)
                    # /2^nb * 2^nb - 1 + 2^nb) / 2)
                    x = int(round(
                        (v * (steps - 1.0) - 1.0 + steps) / 2.0
                    ))
                    w.write(max(0, min(steps - 1, x)), nb)
        w.pad()
        body = hdr + bytes(w.buf)
        if len(body) > frame_len:
            raise Mp3Error("mp3: Layer I frame overflow")
        out += body + b"\x00" * (frame_len - len(body))
    return bytes(out)


def decode_pcm(content: bytes) -> tuple[int, np.ndarray]:
    """MP3 bytes -> (sample_rate, float64 samples [n] mono / [n, 2]
    stereo).

    Walks every frame (ID3v2 skipped, trailing garbage after the last
    full frame ignored as ID3v1/APE tags are), maintains the bit
    reservoir, and runs the full granule pipeline per channel —
    stereo, MS joint stereo (li=(mi+si)/sqrt2, ri=(mi-si)/sqrt2 on the
    requantized spectra), intensity stereo (round 10), and
    dual-channel streams all decode. Output is NOT delay-compensated (the
    spec decoder's ~529-sample filterbank+MDCT latency is left in, as
    real decoders do)."""
    pos = _skip_id3(content)
    rate = None
    nch = None
    free_len = None
    if (
        pos + 4 <= len(content)
        and content[pos] == 0xFF
        and (content[pos + 2] >> 4) & 0xF == 0
    ):
        free_len = _measure_free_format(content, pos)
    reservoir = b""
    overlap = synths = None
    pcm: list[np.ndarray] = []
    n_frames = 0
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            break  # trailing tag/garbage after last frame
        hdr = _parse_header(content[pos: pos + 4], free_len=free_len)
        if rate is None:
            rate, nch = hdr["rate"], hdr["nch"]
            overlap = [np.zeros((32, 18)) for _ in range(nch)]
            synths = [_Synth() for _ in range(nch)]
        elif hdr["rate"] != rate or hdr["nch"] != nch:
            raise Mp3Error("mp3: sample-rate/channel-mode change mid-stream")
        frame = content[pos: pos + hdr["frame_len"]]
        if len(frame) < hdr["frame_len"]:
            raise Mp3Error("mp3: truncated final frame")
        if hdr["layer1"]:
            pcm.extend(_decode_layer1_frame(frame, hdr, synths))
            pos += hdr["frame_len"]
            n_frames += 1
            continue
        off = 4 + (2 if hdr["crc"] else 0)
        if hdr["lsf"]:
            si_len = 9 if nch == 1 else 17
        else:
            si_len = 17 if nch == 1 else 32
        side = frame[off: off + si_len]
        if len(side) < si_len:
            raise Mp3Error("mp3: truncated side info")
        si = _parse_side_info(side, nch, lsf=hdr["lsf"])
        main = frame[off + si_len:]
        # bit reservoir: this frame's granules start main_data_begin
        # bytes BEFORE the end of the accumulated previous main data
        if si["main_data_begin"] > len(reservoir):
            raise Mp3Error(
                "mp3: bit-reservoir underflow (stream does not start at "
                "a reservoir-clean frame)"
            )
        data = (
            reservoir[len(reservoir) - si["main_data_begin"]:] + main
            if si["main_data_begin"]
            else main
        )
        bits = _Bits(data)
        sfb = SFB_LONG[rate]
        sfb_s = SFB_SHORT[rate]
        prev_sf: list = [None] * nch
        for gi, chans in enumerate(si["granules"]):
            xrs = []
            sf_ch: list = []
            for ch, g in enumerate(chans):
                start = bits.pos
                end_bit = start + g["part2_3_length"]
                if g.get("lsf"):
                    sf, sfs = _decode_scalefactors_lsf(bits, g)
                else:
                    sf, sfs = _decode_scalefactors(
                        bits, g,
                        prev_sf[ch] if gi == 1 else None, si["scfsi"][ch],
                    )
                if g["block_type"] != 2:
                    prev_sf[ch] = sf
                iv = _decode_huffman(bits, g, sfb, end_bit)
                bits.pos = end_bit  # skip ancillary/stuffing in the granule
                xr = _requantize(iv, g, sf, sfb, sfs, sfb_s)
                if g["block_type"] == 2 and not hdr["intensity"]:
                    xr = _reorder_short(xr, sfb_s, bool(g["mixed_block"]))
                xrs.append(xr)
                sf_ch.append((sf, sfs))
            if hdr["intensity"] and hdr["lsf"]:
                raise NotImplementedError(
                    "mp3: MPEG-2 LSF intensity stereo not supported (its "
                    "position coding differs from the MPEG-1 tan table)"
                )
            if hdr["intensity"] and nch == 2:
                # joint stereo with intensity: process in the decoded
                # domain (the right channel's zero tail is contiguous
                # there), THEN reorder; MS rides along for the
                # non-intensity bands when also flagged
                sf_r, sfs_r = sf_ch[1]
                xrs = list(_apply_joint_stereo(
                    xrs[0], xrs[1], chans[1], sf_r, sfs_r,
                    sfb, sfb_s, hdr["ms_stereo"],
                ))
                for ch in range(2):
                    if chans[ch]["block_type"] == 2:
                        xrs[ch] = _reorder_short(
                            xrs[ch], sfb_s, bool(chans[ch]["mixed_block"])
                        )
            elif hdr["ms_stereo"]:
                m, s = xrs
                r2 = np.sqrt(2.0)
                xrs = [(m + s) / r2, (m - s) / r2]
            subs = []
            for ch in range(nch):
                g = chans[ch]
                if g["block_type"] == 2 and not g["mixed_block"]:
                    xr = xrs[ch]  # pure short: no alias reduction
                elif g["block_type"] == 2:
                    xr = _alias_reduce(xrs[ch], n_sb=2)  # mixed: long pair
                else:
                    xr = _alias_reduce(xrs[ch])
                sub, overlap[ch] = _imdct_granule(xr, overlap[ch], g)
                subs.append(sub)
            for t in range(18):
                if nch == 1:
                    pcm.append(synths[0].step(subs[0][t]))
                else:
                    pcm.append(
                        np.stack(
                            [synths[ch].step(subs[ch][t]) for ch in range(nch)],
                            axis=1,
                        )
                    )
        reservoir = (reservoir + main)[-511:]
        pos += hdr["frame_len"]
        n_frames += 1
    if n_frames == 0:
        raise Mp3Error("mp3: no frames found")
    return rate, np.concatenate(pcm)


def decode(content: bytes) -> tuple[int, np.ndarray]:
    """MP3 bytes -> (sample_rate, mono float64 samples) — the
    audio_features surface; stereo downmixes to the channel mean."""
    rate, x = decode_pcm(content)
    if x.ndim == 2:
        x = x.mean(axis=1)
    return rate, x


# --- fixture encoder -------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def pad(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def bitlen(self) -> int:
        return len(self.buf) * 8 + self.nbits

    def extend(self, other: "_BitWriter") -> None:
        for byte in other.buf:
            self.write(byte, 8)
        if other.nbits:
            self.write(other.acc, other.nbits)


def _analysis(x: np.ndarray) -> np.ndarray:
    """Spec analysis filterbank (figure C.4): PCM -> subband samples
    [n_steps, 32] (one step per 32 input samples)."""
    n_steps = len(x) // 32
    fifo = np.zeros(512)
    out = np.empty((n_steps, 32))
    for t in range(n_steps):
        fifo = np.roll(fifo, 32)
        fifo[:32] = x[t * 32: t * 32 + 32][::-1]
        z = fifo * _C_WINDOW
        y = z.reshape(8, 64).sum(axis=0)
        out[t] = _M_ANA @ y
    return out


def _mdct_granule(sub: np.ndarray, prev: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward long-block MDCT: 18 current + 18 previous subband samples
    per subband -> 18 spectral lines (inverse of _imdct_granule up to
    the TDAC factor 1/18 applied here so decode reproduces input)."""
    cur = sub.copy()
    cur[1::2, 1::2] *= -1.0  # frequency inversion (self-inverse)
    X = np.empty((32, 18))
    for sb in range(32):
        z = np.concatenate([prev[sb], cur[:, sb]]) * _WIN_LONG
        X[sb] = (z @ _IMDCT36) / 9.0  # TDAC gain of the sine-window pair is N/4
    return X.reshape(576), cur.T.copy()  # [32,18] per-subband history


def _quantize_iv(X: np.ndarray, vmax: int) -> tuple[np.ndarray, int]:
    """Quantize 576 spectral lines to integers with |iv| <= vmax,
    choosing global_gain so the largest line lands near vmax (the
    decoder reconstructs |iv|^(4/3) * 2^(0.25*(gg-210)))."""
    amax = np.abs(X).max()
    if amax <= 0:
        return np.zeros(576, dtype=np.int64), 0
    if vmax <= 1:
        gg = max(0, min(255, int(round(210 + 4 * np.log2(amax)))))
        scale = 2.0 ** (0.25 * (gg - 210))
        return np.where(np.abs(X) > scale / 2, np.sign(X), 0).astype(np.int64), gg
    gain = amax / ((vmax + 0.49) ** (4.0 / 3.0))
    gg = max(0, min(255, int(round(210 + 4 * np.log2(gain)))))
    scale = 2.0 ** (0.25 * (gg - 210))
    mag = np.minimum(np.round(np.abs(X / scale) ** 0.75), vmax)
    return (np.sign(X) * mag).astype(np.int64), gg


def _encode_granule_bits(
    iv: np.ndarray, count1_a: bool = False
) -> tuple[_BitWriter, dict]:
    """Entropy-code one granule's integer spectrum: the big-values
    region (everything up to the last |v| > 1, pair-coded with the
    smallest bundled Table B.7 table that covers its max) then the
    count1 region (quadruples of |v| <= 1, table A or B). Returns the
    bit payload and the side-info fields it implies."""
    w = _BitWriter()
    idx_gt1 = np.flatnonzero(np.abs(iv) > 1)
    big_end = 0
    if len(idx_gt1):
        big_end = int(idx_gt1[-1]) + 1
        big_end += big_end % 2
    vmax = int(np.abs(iv[:big_end]).max()) if big_end else 0
    if vmax > 15:
        raise Mp3Error(f"mp3 encoder: |value| {vmax} exceeds bundled tables")
    table = 0 if vmax == 0 else (
        1 if vmax <= 1 else 2 if vmax <= 2 else 5 if vmax <= 3
        else 7 if vmax <= 5 else 10 if vmax <= 7 else 15
    )
    if table:
        xlen, _lb, hc, hl = HUFF_BIG[table]
        for pos in range(0, big_end, 2):
            x, y = int(abs(iv[pos])), int(abs(iv[pos + 1]))
            sym = x * xlen + y
            w.write(hc[sym], hl[sym])
            if x:
                w.write(1 if iv[pos] < 0 else 0, 1)
            if y:
                w.write(1 if iv[pos + 1] < 0 else 0, 1)
    nz_top = int(np.flatnonzero(iv)[-1]) if iv.any() else -1
    n_quads = 0
    if nz_top >= big_end:
        n_quads = min((576 - big_end) // 4, (nz_top - big_end) // 4 + 1)
    for q in range(n_quads):
        vals = iv[big_end + q * 4: big_end + q * 4 + 4]
        code = 0
        for v in vals:
            code = (code << 1) | (1 if v != 0 else 0)
        if count1_a:
            w.write(COUNT1_A[0][code], COUNT1_A[1][code])
        else:
            w.write(code ^ 0xF, 4)
        for v in vals:
            if v != 0:
                w.write(1 if v < 0 else 0, 1)
    return w, {
        "big_values": big_end // 2,
        "table": table,
        "c1sel": 0 if count1_a else 1,
    }


def _mdct_granule_short(
    sub: np.ndarray, prev: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Forward short-block hybrid MDCT: per subband, three windowed
    12-point MDCTs at 6-sample hops over (prev 18 + cur 18) samples —
    the exact transpose of _imdct_short_sb with the TDAC gain N/4 = 3
    folded in. Output is in FILTERBANK order (subband-major,
    window-major within subband)."""
    cur = sub.copy()
    cur[1::2, 1::2] *= -1.0  # frequency inversion (self-inverse)
    X = np.empty((32, 18))
    for sb in range(32):
        z = np.concatenate([prev[sb], cur[:, sb]])
        for w in range(3):
            seg = z[6 + 6 * w: 18 + 6 * w] * _WIN_SHORT
            X[sb, w * 6: w * 6 + 6] = (seg @ _IMDCT12) / 3.0
    return X.reshape(576), cur.T.copy()


def _short_perm(sfb_s: tuple) -> np.ndarray:
    """perm[decoded_index] = filterbank_index — the inverse of the
    decoder's _reorder_short, used by the encoder to write short-block
    spectra in the wire (scalefactor-band, window, line) order."""
    perm = np.empty(576, dtype=np.int64)
    for band in range(len(sfb_s) - 1):
        width = sfb_s[band + 1] - sfb_s[band]
        base = 3 * sfb_s[band]
        for w in range(3):
            for i in range(width):
                k = sfb_s[band] + i
                perm[base + w * width + i] = (k // 6) * 18 + w * 6 + (k % 6)
    return perm


def encode(
    pcm: np.ndarray,
    rate: int = 44100,
    bitrate: int = 160_000,
    ms_stereo: bool = False,
    count1_a: bool = False,
    block_type: str = "long",
) -> bytes:
    """Float PCM ([n] mono or [n, 2] stereo) -> MPEG-1 Layer III CBR
    frames using the bundled entropy layer (round 9): each granule
    quantizes to |iv| <= 15 and pair-codes its big-values region with
    the smallest covering Table B.7 table (1/2/5/7/10/15), falling back to
    coarser quantization ({-1,0,+1}, count1-only) granule-by-granule
    when the frame budget is tight; the count1 region uses table B, or
    table A with ``count1_a=True``. ``block_type="short"`` writes every
    granule as a pure short block (window_switching, block_type 2,
    three windowed 12-point MDCTs per subband, spectra reordered to
    the wire order) — the decoder's short path round-trips it. A
    fixture/roundtrip encoder, not a perceptual one; roundtrip SNR on
    narrowband signals is pinned by test. Stereo input writes
    mode=stereo frames, or — with ms_stereo=True — joint stereo with
    the MS matrix (mi=(li+ri)/sqrt2, si=(li-ri)/sqrt2). Frames carry
    main_data_begin=0 (no reservoir borrowing) and pad part2_3_length
    with stuffing zeros the decoder skips."""
    if block_type not in ("long", "short"):
        raise Mp3Error(f"mp3: unsupported encoder block_type {block_type!r}")
    v25 = rate in SAMPLE_RATES_V25
    lsf = v25 or rate in SAMPLE_RATES_V2  # LSF: 1 granule per frame
    if not lsf and rate not in SAMPLE_RATES_V1:
        raise Mp3Error(f"mp3: unsupported sample rate {rate}")
    if lsf:
        sr_idx = (
            SAMPLE_RATES_V25.index(rate)
            if v25
            else SAMPLE_RATES_V2.index(rate)
        )
        try:
            br_idx = BITRATES_V2L3.index(bitrate // 1000)
        except ValueError:
            raise Mp3Error(f"mp3: unsupported LSF bitrate {bitrate}")
        frame_len = 72 * bitrate // rate
    else:
        sr_idx = SAMPLE_RATES_V1.index(rate)
        try:
            br_idx = BITRATES_V1L3.index(bitrate // 1000)
        except ValueError:
            raise Mp3Error(f"mp3: unsupported bitrate {bitrate}")
        frame_len = 144 * bitrate // rate  # padding bit unused (fixture CBR)

    pcm = np.asarray(pcm, dtype=np.float64)
    nch = 2 if pcm.ndim == 2 else 1
    if nch == 1 and ms_stereo:
        raise Mp3Error("mp3: ms_stereo needs 2-channel input")
    n = pcm.shape[0]
    n_gran = max(1, -(-n // 576))
    if not lsf and n_gran % 2:
        n_gran += 1  # MPEG-1 frames carry two granules
    if nch == 1:
        chans = [np.zeros(n_gran * 576)]
        chans[0][:n] = pcm
    else:
        l = np.zeros(n_gran * 576)
        r = np.zeros(n_gran * 576)
        l[:n], r[:n] = pcm[:, 0], pcm[:, 1]
        if ms_stereo:
            r2 = np.sqrt(2.0)
            chans = [(l + r) / r2, (l - r) / r2]  # M, S
        else:
            chans = [l, r]
    subs = [_analysis(x) for x in chans]  # per channel [n_gran*18, 32]

    if nch == 1:
        mode_byte = 3 << 6  # single_channel
    elif ms_stereo:
        mode_byte = (1 << 6) | (2 << 4)  # joint stereo, MS on
    else:
        mode_byte = 0 << 6  # stereo

    short = block_type == "short"
    perm = _short_perm(SFB_SHORT[rate]) if short else None
    gran_per_frame = 1 if lsf else 2
    if lsf:
        si_len = 9 if nch == 1 else 17
    else:
        si_len = 17 if nch == 1 else 32
    # per-granule bit budget within the CBR frame (equal split)
    budget = (frame_len - 4 - si_len) * 8 // (gran_per_frame * nch)

    out = bytearray()
    prev = [np.zeros((32, 18)) for _ in range(nch)]
    for f in range(n_gran // gran_per_frame):
        # all granule/channel main data streams into ONE writer in wire
        # order (gr0ch0 gr0ch1 gr1ch0 gr1ch1) — the spec does not
        # byte-align the boundaries; the decoder walks part2_3_length
        w = _BitWriter()
        granule_meta = []  # [(bits, gg, meta)] in wire order
        for gi in range(gran_per_frame):
            g0 = (f * gran_per_frame + gi) * 18
            for ch in range(nch):
                if short:
                    X, prev[ch] = _mdct_granule_short(
                        subs[ch][g0: g0 + 18], prev[ch]
                    )
                else:
                    X, prev[ch] = _mdct_granule(subs[ch][g0: g0 + 18], prev[ch])
                # finest quantization whose payload fits the budget
                for vmax in (15, 7, 5, 3, 2, 1):
                    iv, gg = _quantize_iv(X, vmax)
                    if short:
                        iv = iv[perm]  # wire order (band, window, line)
                    gw, meta = _encode_granule_bits(iv, count1_a=count1_a)
                    if gw.bitlen() <= budget and gw.bitlen() <= 4095:
                        break
                else:
                    raise Mp3Error(
                        "mp3: granule does not fit frame — raise bitrate"
                    )
                granule_meta.append((gw.bitlen(), gg, meta))
                w.extend(gw)
        w.pad()
        main = bytes(w.buf)
        version_bits = 0 if v25 else 2 if lsf else 3
        hdr = bytes(
            [
                0xFF,
                0xE0 | (version_bits << 3) | (1 << 1) | 1,  # L III, no CRC
                (br_idx << 4) | (sr_idx << 2) | (0 << 1),
                mode_byte,
            ]
        )
        side = _BitWriter()
        if lsf:
            side.write(0, 8)  # main_data_begin
            side.write(0, 1 if nch == 1 else 2)  # private; no scfsi
        else:
            side.write(0, 9)  # main_data_begin
            side.write(0, 5 if nch == 1 else 3)  # private
            for _ in range(4 * nch):
                side.write(0, 1)  # scfsi
        for used_bits, gg, meta in granule_meta:
            side.write(used_bits, 12)  # part2_3_length (scalefacs 0 bits)
            side.write(meta["big_values"], 9)
            side.write(gg, 8)
            # scalefac_compress 0 -> all-zero slens in BOTH variants
            side.write(0, 9 if lsf else 4)
            if short:
                side.write(1, 1)  # window_switching
                side.write(2, 2)  # block_type = short
                side.write(0, 1)  # mixed_block = 0
                for _ in range(2):
                    side.write(meta["table"], 5)
                for _ in range(3):
                    side.write(0, 3)  # subblock_gain
            else:
                side.write(0, 1)  # window_switching: long block
                for _ in range(3):
                    side.write(meta["table"], 5)
                side.write(7, 4)  # region0_count (same table everywhere)
                side.write(7, 3)  # region1_count
            if not lsf:
                side.write(0, 1)  # preflag (absent in LSF side info)
            side.write(0, 1)  # scalefac_scale
            side.write(meta["c1sel"], 1)  # count1table_select
        side.pad()
        assert len(side.buf) == si_len
        body = hdr + bytes(side.buf) + main
        if len(body) > frame_len:
            raise Mp3Error(
                f"mp3: frame overflow ({len(body)} > {frame_len}) — raise bitrate"
            )
        out += body + b"\x00" * (frame_len - len(body))
    return bytes(out)
