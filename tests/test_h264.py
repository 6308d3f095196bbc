"""H.264 baseline intra codec (operators/h264dec.py, VERDICT r8 task 8).

Pure-Python tests (no Spark): VLC table validity, the published CAVLC
worked example, residual round-trip fuzz, I_PCM and Intra_16x16 frame
round-trips including the exactness sweep the fixture query relies on,
hand-built Intra_4x4 bitstream decode, and the refusal paths for
unsupported stream features. The Spark-side integration (mdat tier +
oracle) is covered by the registered `multimodal_h264_keyframe_stats`
query in tests/test_queries_oracle.py.
"""

from __future__ import annotations

import itertools
import random

import pytest

from pgwarehouse_spark.operators import h264dec as h
from pgwarehouse_spark.operators.multimodal import (
    build_mp4_container,
    extract_avc_frames,
)

W, H = 32, 16


def _frame(e1: int, e2: int, e3: int) -> bytes:
    """32x16 grayscale three-band fixture (cols 0-7 / 8-15 / 16-31)."""
    return bytes(
        v
        for y in range(H)
        for x in range(W)
        for v in ((e1 if x < 8 else (e2 if x < 16 else e3)),) * 3
    )


# ---- table validity ---------------------------------------------------


@pytest.mark.parametrize("table,complete", [
    (h.COEFF_TOKEN_NC0, False),
    (h.COEFF_TOKEN_NC2, False),
    (h.COEFF_TOKEN_NC4, False),
    (h.COEFF_TOKEN_CHROMA_DC, True),
])
def test_coeff_token_tables_prefix_free_and_kraft(table, complete):
    codes = list(table.values())
    assert len(set(codes)) == len(codes)
    for a, b in itertools.permutations(codes, 2):
        assert not a.startswith(b), (a, b)
    kraft = sum(2.0 ** -len(c) for c in codes)
    assert kraft <= 1.0 + 1e-12
    if complete:  # the chroma DC column is a complete prefix code
        assert abs(kraft - 1.0) < 1e-12
    # full (TotalCoeff, TrailingOnes) domain covered
    assert all(
        (tc, t1) in table
        for tc in range(len(codes) == 15 and 5 or 17)
        for t1 in range(min(3, tc) + 1)
        if len(codes) > 15 or tc <= 4
    )


@pytest.mark.parametrize("rows", [h.TOTAL_ZEROS_4x4, h.TOTAL_ZEROS_CHROMA_DC,
                                  h.RUN_BEFORE])
def test_scan_tables_prefix_free(rows):
    for key, codes in rows.items():
        assert len(set(codes)) == len(codes), key
        for a, b in itertools.permutations(codes, 2):
            assert not a.startswith(b), (key, a, b)
        assert sum(2.0 ** -len(c) for c in codes) <= 1.0 + 1e-12, key


def test_total_zeros_rows_complete():
    """Tables 9-7/9-8 rows for TotalCoeff >= 2 are complete prefix
    codes (Kraft == 1) — a transcription slip in any length breaks
    this. TC=1's row is deliberately incomplete in the spec."""
    for tc, codes in h.TOTAL_ZEROS_4x4.items():
        kraft = sum(2.0 ** -len(c) for c in codes)
        if tc >= 2:
            assert abs(kraft - 1.0) < 1e-12, (tc, kraft)
        assert len(codes) == 17 - tc if tc == 1 else True


def test_published_cavlc_worked_example():
    """The standard CAVLC textbook example (block 0,3,0,1,-1,-1,0,1 in
    zigzag order; TotalCoeffs 5, TrailingOnes 3, total_zeros 3, nC 0)
    must emit the published bitstream — this pins the nC<2 coeff_token
    entry, the trailing-one signs, the level state machine, total_zeros
    and every run_before the example touches."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    w = h.BitWriter()
    assert h.encode_residual_cavlc(w, coeffs, 0) == 5
    assert "".join(map(str, w.bits)) == "000010001110010111101101"
    # and the decoder reads it back
    w.write_bit(1)
    while len(w.bits) % 8:
        w.write_bit(0)
    assert h.decode_residual_cavlc(h.BitReader(w.to_bytes()), 0, 16) == coeffs


def test_residual_cavlc_roundtrip_fuzz():
    """Exhaustive-ish round-trip across nC classes, block sizes, level
    magnitudes (incl. suffix escalation and escape codes), and sparsity
    — encoder and decoder must agree bit-for-bit on every block."""
    rng = random.Random(7)
    for _ in range(2500):
        max_coeff = rng.choice([16, 15, 4])
        n = rng.randint(0, max_coeff)
        coeffs = [0] * max_coeff
        for p in rng.sample(range(max_coeff), n):
            coeffs[p] = rng.choice([1, -1]) * rng.randint(
                1, rng.choice([1, 2, 3, 8, 50, 3000])
            )
        nC = rng.choice([0, 1, 2, 3, 4, 7, 8, 20]) if max_coeff != 4 else -1
        w = h.BitWriter()
        h.encode_residual_cavlc(w, coeffs, nC)
        w.write_bit(1)
        while len(w.bits) % 8:
            w.write_bit(0)
        got = h.decode_residual_cavlc(h.BitReader(w.to_bytes()), nC, max_coeff)
        assert got == coeffs, (nC, max_coeff, coeffs, got)


def test_exp_golomb_and_ebsp_roundtrip():
    w = h.BitWriter()
    vals = [0, 1, 2, 7, 255, 4094]
    svals = [0, 1, -1, 63, -64]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    data = w.to_bytes()
    r = h.BitReader(h.ebsp_to_rbsp(h.rbsp_to_ebsp(data)))
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals
    # emulation prevention inserts and strips cleanly around 00 00 xx
    raw = b"\x00\x00\x01\x00\x00\x00\x00\x00\x02\xff"
    assert h.ebsp_to_rbsp(h.rbsp_to_ebsp(raw)) == raw


# ---- frame round-trips ------------------------------------------------


def test_ipcm_frame_roundtrip_arbitrary_content():
    rng = random.Random(11)
    rgb = bytes(
        v for _ in range(W * H) for v in (rng.randrange(256),) * 3
    )
    au = h.encode_avc_keyframe(rgb, W, H, pcm=True)
    w2, h2, dec = h.decode_avc_keyframe(au)
    assert (w2, h2) == (W, H)
    assert dec == rgb


def test_i16_cavlc_frame_exactness_sweep():
    """The fixture query's exactness contract: every multiple-of-32
    three-band frame round-trips EXACTLY through the Intra_16x16 CAVLC
    path (forward transform -> Hadamard/2 -> quant -> CAVLC -> dequant
    -> inverse -> DC prediction chain) at the query's qp=8, and at two
    other QPs to pin the scaling arithmetic across qp/6 regimes."""
    vals = list(range(0, 256, 32))
    for qp in (8, 0, 16):
        for e1, e2, e3 in itertools.product(vals[::2], vals[1::2], vals[::3]):
            rgb = _frame(e1, e2, e3)
            au = h.encode_avc_keyframe(rgb, W, H, qp=qp)
            _, _, dec = h.decode_avc_keyframe(au)
            assert dec == rgb, (qp, e1, e2, e3)


def test_i16_stream_is_compressed_and_real_cavlc():
    """The I16 access unit must actually be entropy-coded (far smaller
    than PCM) and decode via the CAVLC path, not PCM."""
    rgb = _frame(32, 96, 224)
    au = h.encode_avc_keyframe(rgb, W, H, qp=8)
    pcm = h.encode_avc_keyframe(rgb, W, H, pcm=True)
    assert len(au) < len(pcm) / 4
    # the slice contains no I_PCM mb_type: decode succeeds and matches
    assert h.decode_avc_keyframe(au)[2] == rgb


def test_intra4x4_bitstream_decodes():
    """Hand-built Intra_4x4 macroblock (the decoder path the fixture
    encoder does not emit): DC mode on every 4x4 block, one coded 8x8
    region, reconstruction checked against the module's own transform
    primitives composed independently of the MB parser."""
    s = h.BitWriter()
    s.ue(0)            # first_mb_in_slice
    s.ue(7)            # slice_type I
    s.ue(0)            # pps id
    s.write_bits(0, 4)  # frame_num
    s.ue(0)            # idr_pic_id
    s.write_bit(0)
    s.write_bit(0)
    s.se(0)            # slice_qp_delta (qp = 26 from PPS below)
    s.ue(1)            # disable_deblocking_filter_idc
    s.ue(0)            # mb_type = Intra_4x4
    for _ in range(16):
        s.write_bit(1)  # prev_intra4x4_pred_mode_flag -> predicted (DC)
    s.ue(0)            # intra_chroma_pred_mode DC
    s.ue(h._CBP_INTRA_INV[1])  # cbp: luma 8x8 block 0 coded, chroma 0
    s.se(0)            # mb_qp_delta
    level = 4
    for _blk in range(4):  # blocks 0..3: single DC coefficient `level`
        w0 = h.BitWriter()
        h.encode_residual_cavlc(w0, [level] + [0] * 15, 0)
        # nC stays 0 for block 0; later blocks see coded neighbors —
        # recompute per block like the decoder will
        s.write_str("".join(map(str, w0.bits))) if _blk == 0 else None
        if _blk:
            # neighbor nC: block1 sees A=blk0(1); block2 sees B=blk0(1);
            # block3 sees A=blk2,B=blk1 -> (1+1+1)>>1 = 1 — all class 0
            w1 = h.BitWriter()
            h.encode_residual_cavlc(w1, [level] + [0] * 15, 1)
            s.write_str("".join(map(str, w1.bits)))
    s.rbsp_trailing()
    out = bytearray()
    h._write_nal(out, 3, 7, h._sps_rbsp(1, 1))
    h._write_nal(out, 3, 8, h._pps_rbsp(26))
    h._write_nal(out, 3, 5, s.to_bytes())
    w2, h2, rgb = h.decode_avc_keyframe(bytes(out))
    assert (w2, h2) == (16, 16)
    # expected: DC prediction chains through the reconstructions —
    # blk0 pred 128 (no neighbors), blk1/blk2 predict off blk0's edge,
    # blk3 off blk1+blk2; each adds the same dequantized DC residual
    res = h.inverse_transform4x4(
        h.dequant4x4([level] + [0] * 15, 26)
    )[0]
    b0 = max(0, min(255, 128 + res))        # (0,0) block
    b12 = max(0, min(255, b0 + res))        # (4,0) and (0,4) blocks
    b3 = max(0, min(255, b12 + res))        # (4,4) block
    assert rgb[(0 * 16 + 0) * 3] == b0
    assert rgb[(0 * 16 + 4) * 3] == b12 and rgb[(4 * 16 + 0) * 3] == b12
    assert rgb[(4 * 16 + 4) * 3] == b3
    # the uncoded 8x8 regions predict DC off the reconstructed left/top
    assert rgb[(0 * 16 + 12) * 3] != 0  # decoded, in range
    assert len(rgb) == 16 * 16 * 3


def test_decoder_refuses_unsupported_features():
    rgb = _frame(0, 32, 64)
    au = bytearray(h.encode_avc_keyframe(rgb, W, H, qp=8))
    # CABAC PPS refused
    with pytest.raises(ValueError, match="CABAC"):
        bad_pps = h.BitWriter()
        bad_pps.ue(0)
        bad_pps.ue(0)
        bad_pps.write_bit(1)  # entropy_coding_mode_flag
        bad_pps.rbsp_trailing()
        h.parse_pps(bad_pps.to_bytes())
    # deblocking-on stream refused (disable_deblocking_filter_idc=0)
    out = bytearray()
    h._write_nal(out, 3, 7, h._sps_rbsp(2, 1))
    h._write_nal(out, 3, 8, h._pps_rbsp(8))
    s = h.BitWriter()
    s.ue(0); s.ue(7); s.ue(0); s.write_bits(0, 4); s.ue(0)
    s.write_bit(0); s.write_bit(0); s.se(0)
    s.ue(0)  # disable_deblocking_filter_idc = 0 -> deblocking required
    s.rbsp_trailing()
    h._write_nal(out, 3, 5, s.to_bytes())
    with pytest.raises(ValueError, match="deblocking"):
        h.decode_avc_keyframe(bytes(out))
    # high-profile SPS refused
    hp = h.BitWriter()
    hp.write_bits(100, 8)
    hp.write_bits(0, 8)
    hp.write_bits(10, 8)
    hp.ue(0)
    hp.rbsp_trailing()
    with pytest.raises(ValueError, match="high profile"):
        h.parse_sps(hp.to_bytes())


def test_extract_avc_frames_container_tier():
    """The sample_frames tier end-to-end without Spark: build an
    AVC-in-MP4 container, extract + decode the sampled frames, and
    confirm the acceptance test rejects non-AVC containers."""
    aus = [
        h.encode_avc_keyframe(_frame(32, 96, 160), W, H, qp=8),
        h.encode_avc_keyframe(_frame(224, 0, 64), W, H, qp=8),
    ]
    payload = build_mp4_container(W, H, 2000, frames=aus, codec="avc1")
    frames = extract_avc_frames(payload)
    assert frames is not None and len(frames) == 2
    (ts0, f0), (ts1, f1) = frames
    assert (ts0, ts1) == (0, 1000)
    assert f0 == _frame(32, 96, 160) and f1 == _frame(224, 0, 64)
    # a raw container must fall through this tier (None), not misparse
    raw = build_mp4_container(W, H, 1000, frames=[b"\x10" * (W * H * 3)],
                              codec="raw")
    assert extract_avc_frames(raw) is None
