"""Pure-Python baseline JPEG codec (VERDICT r5 task 5).

The container has no image codec library (no PIL/av), so the MJPEG
frame tier of ``sample_frames`` needs a genuine DCT decode path that
runs on the stdlib alone. This module implements baseline sequential
AND progressive JFIF (ITU-T T.81):

- ``decode_jpeg``: marker walk (DQT/SOF0/SOF2/DHT/DRI/SOS), huffman
  entropy decode with DC prediction and restart-marker handling,
  dequantize, inverse zigzag, 2-D IDCT, nearest-neighbor chroma
  upsample (sampling factors 1-2), YCbCr→RGB. Huffman and quant tables
  are read from the FILE (DHT/DQT segments), so any baseline JPEG
  decodes — not just this module's own output. Progressive (SOF2,
  VERDICT r6 task 8) supports all four scan types of T.81 annex G:
  DC first/refinement (successive approximation) and AC
  first/refinement (spectral selection + EOB runs), coefficients
  accumulated across scans and reconstructed at EOI.
- ``encode_baseline_jpeg`` / ``encode_progressive_jpeg``: the fixture
  producers — 4:4:4, flat quant tables, spec-valid canonical huffman
  tables; exist so tests and the ``multimodal_mjpeg_frame_stats`` /
  ``multimodal_progressive_jpeg_stats`` queries can synthesize real
  JPEG bitstreams executor-side and prove the decoder runs real
  huffman+IDCT (multi-scan for the progressive variant).

Reference parity note: the reference tool has no media path at all —
this belongs to the repo's LLM-pipeline extension surface
(multimodal.py), closing the last lib-gated branch of the video tier
(raw RGB24 decoded since r5; MJPEG now; exotic codecs still stub).

Scale: decode runs inside Arrow-batched ``mapInPandas`` workers, one
frame at a time, no state shared across rows — the same distribution
contract as the raw-RGB24 tier. Per-frame cost is O(pixels·64) from the
naive IDCT; fine for thumbnail-scale fixtures, and the tier is swapped
for a codec lib wholesale when one is installed.
"""

from __future__ import annotations

import math
import struct

# zigzag scan order, generated (not transcribed) from the diagonal walk
def _zigzag() -> list[int]:
    order = sorted(
        ((x + y, (y if (x + y) % 2 == 0 else x), x, y)
         for y in range(8) for x in range(8))
    )
    return [y * 8 + x for _, _, x, y in order]


ZIGZAG = _zigzag()

# separable IDCT/FDCT basis: C[u][x] = c(u)*cos((2x+1)uπ/16)
_BASIS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _idct_block(coef: list[float]) -> list[float]:
    # rows then columns, 0.5 scale per pass (orthonormal 2-D: 1/4)
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        for x in range(8):
            tmp[y * 8 + x] = 0.5 * sum(row[u] * _BASIS[u][x] for u in range(8))
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            out[y * 8 + x] = 0.5 * sum(col[v] * _BASIS[v][y] for v in range(8))
    return out


def _fdct_block(px: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for y in range(8):
        row = px[y * 8 : y * 8 + 8]
        for u in range(8):
            tmp[y * 8 + u] = 0.5 * sum(row[x] * _BASIS[u][x] for x in range(8))
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            out[v * 8 + u] = 0.5 * sum(col[y] * _BASIS[v][y] for y in range(8))
    return out


class _HuffTable:
    """Canonical JPEG huffman table from a DHT (bits, values) pair:
    codes of each length are assigned in value order, doubling the code
    space between lengths (T.81 annex C)."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid huffman code")


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    non-stuffing marker (EOI / RSTn are handled by the caller)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos = buf, pos
        self.cur, self.nbits = 0, 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated entropy data")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.buf[self.pos] if self.pos < len(self.buf) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    raise _MarkerHit(nxt)
            self.cur, self.nbits = b, 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        """n raw bits as an unsigned int (EOB-run lengths, G.1.2.2)."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.receive(s)
        if v < (1 << (s - 1)):  # negative branch (T.81 F.12 EXTEND)
            v -= (1 << s) - 1
        return v

    def align(self) -> None:
        self.nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int | None):
        self.marker = marker


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes] | None:
    """Decode a baseline-sequential (SOF0) or progressive (SOF2) JFIF
    payload to ``(width, height, rgb24_bytes)``; None for anything that
    is not decodable (other SOF variants, truncation, garbage)."""
    try:
        return _decode(payload)
    except (ValueError, IndexError, KeyError, struct.error, _MarkerHit):
        return None


#: legacy name kept for call sites written when only SOF0 decoded;
#: progressive payloads now decode through the same entry.
decode_baseline_jpeg = decode_jpeg


def _decode(buf: bytes) -> tuple[int, int, bytes] | None:
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        return None
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (w, h, comps) comps: [(cid, hf, vf, tq)]
    progressive = False
    coef_state = None  # lazily-allocated _CoefState for SOF2
    restart_interval = 0
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coef_state is not None:
                return coef_state.reconstruct(qt)
            return None  # EOI before SOS in a baseline stream
        if pos + 2 > len(buf):
            return None
        (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
        seg = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = seg[i + 1 : i + 1 + n]
                if prec:
                    vals = list(struct.unpack(f">{64}H", raw))
                else:
                    vals = list(raw)
                qt[tid] = vals
                i += 1 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3):  # other SOF variants unsupported
            return None
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                values = list(seg[i + 17 : i + 17 + nv])
                table = _HuffTable(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = seg[0]
            if not progressive:
                scan = []  # (comp_index, dc_table, ac_table)
                for c in range(ns):
                    cs, tda = seg[1 + c * 2 : 3 + c * 2]
                    ci = next(
                        i for i, comp in enumerate(frame[2]) if comp[0] == cs
                    )
                    scan.append((ci, huff_dc[tda >> 4], huff_ac[tda & 0x0F]))
                return _decode_scan(
                    buf, pos + seglen, frame, scan, qt, restart_interval
                )
            # progressive: accumulate this scan's coefficients, then
            # continue the marker walk from wherever the entropy data
            # ended (multi-scan stream)
            if coef_state is None:
                coef_state = _CoefState(frame)
            scan_comps = []
            for c in range(ns):
                cs, tda = seg[1 + c * 2 : 3 + c * 2]
                ci = next(
                    i for i, comp in enumerate(frame[2]) if comp[0] == cs
                )
                scan_comps.append(
                    (ci, huff_dc.get(tda >> 4), huff_ac.get(tda & 0x0F))
                )
            ss, se, aa = seg[1 + ns * 2 : 4 + ns * 2]
            ah, al = aa >> 4, aa & 0x0F
            pos = _progressive_scan(
                buf, pos + seglen, coef_state, scan_comps,
                ss, se, ah, al, restart_interval,
            )
            continue
        # APPn/COM/others: skip
        pos += seglen
    return None


def _decode_scan(buf, pos, frame, scan, qt, restart_interval):
    w, h, comps = frame
    if w <= 0 or h <= 0:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or hmax > 2 or vmax < 1 or vmax > 2:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component sample planes at their own resolution
    planes = []
    for _cid, hf, vf, _tq in comps:
        planes.append([0] * (mcux * hf * 8 * mcuy * vf * 8))

    reader = _BitReader(buf, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                _consume_restart(reader)
                preds = [0] * len(comps)
            for ci, dc_tab, ac_tab in scan:
                _cid, hf, vf, tq = comps[ci]
                q = qt[tq]
                for by in range(vf):
                    for bx in range(hf):
                        coef = [0.0] * 64
                        s = dc_tab.decode(reader)
                        preds[ci] += reader.receive_extend(s)
                        coef[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[ZIGZAG[k]] = (
                                reader.receive_extend(s) * q[k]
                            )
                            k += 1
                        px = _idct_block(coef)
                        plane = planes[ci]
                        stride = mcux * hf * 8
                        ox = (mx * hf + bx) * 8
                        oy = (my * vf + by) * 8
                        for yy in range(8):
                            base = (oy + yy) * stride + ox
                            row = px[yy * 8 : yy * 8 + 8]
                            for xx in range(8):
                                v = int(round(row[xx] + 128.0))
                                plane[base + xx] = (
                                    0 if v < 0 else (255 if v > 255 else v)
                                )
            mcu_count += 1

    return _planes_to_rgb(w, h, comps, planes, mcux, hmax, vmax)


def _planes_to_rgb(w, h, comps, planes, mcux, hmax, vmax):
    """Nearest-neighbor chroma upsample + YCbCr→RGB (shared by the
    baseline one-shot scan and the progressive reconstruction)."""
    out = bytearray(w * h * 3)
    n = len(comps)
    strides = [mcux * c[1] * 8 for c in comps]
    for y in range(h):
        for x in range(w):
            samples = []
            for ci, (_cid, hf, vf, _tq) in enumerate(comps):
                sx = x * hf // hmax
                sy = y * vf // vmax
                samples.append(planes[ci][sy * strides[ci] + sx])
            o = (y * w + x) * 3
            if n >= 3:
                yv, cb, cr = samples[0], samples[1] - 128, samples[2] - 128
                r = int(round(yv + 1.402 * cr))
                g = int(round(yv - 0.344136 * cb - 0.714136 * cr))
                b = int(round(yv + 1.772 * cb))
                out[o] = 0 if r < 0 else (255 if r > 255 else r)
                out[o + 1] = 0 if g < 0 else (255 if g > 255 else g)
                out[o + 2] = 0 if b < 0 else (255 if b > 255 else b)
            else:  # grayscale
                out[o] = out[o + 1] = out[o + 2] = samples[0]
    return w, h, bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode: spectral selection + successive
# approximation (T.81 annex G). Coefficients accumulate across scans in
# a per-component store; dequantize + IDCT run once at EOI.
# ---------------------------------------------------------------------------


def _consume_restart(reader: _BitReader) -> None:
    reader.align()
    try:
        reader.bit()
        raise ValueError("expected restart marker")
    except _MarkerHit as hit:
        if hit.marker is None or not (0xD0 <= hit.marker <= 0xD7):
            raise ValueError("bad restart marker")
        reader.pos += 1
        reader.nbits = 0


class _CoefState:
    """Per-component dequantization-deferred coefficient planes for a
    progressive frame, laid out on the padded MCU block grid (same
    geometry as the baseline sample planes)."""

    def __init__(self, frame):
        w, h, comps = frame
        if w <= 0 or h <= 0:
            raise ValueError("bad dimensions")
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        if not (1 <= self.hmax <= 2 and 1 <= self.vmax <= 2):
            raise ValueError("unsupported sampling factors")
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coefs: list[list[list[int]]] = []
        self.grid: list[tuple[int, int, int, int]] = []  # (wb, hb, nbx, nby)
        for _cid, hf, vf, _tq in comps:
            wb, hb = self.mcux * hf, self.mcuy * vf  # padded block grid
            # non-interleaved scans cover only the component's REAL
            # block extent (T.81 A.2.2), not the MCU-padded grid
            xi = -(-(w * hf) // self.hmax)
            yi = -(-(h * vf) // self.vmax)
            nbx, nby = -(-xi // 8), -(-yi // 8)
            self.coefs.append([[0] * 64 for _ in range(wb * hb)])
            self.grid.append((wb, hb, nbx, nby))
        self.preds = [0] * len(comps)

    def reconstruct(self, qt) -> tuple[int, int, bytes]:
        w, h, comps = self.frame
        # quant table re-indexed to natural order (DQT stores zigzag)
        planes = []
        for ci, (_cid, hf, vf, tq) in enumerate(comps):
            q = qt[tq]
            qnat = [0] * 64
            for k in range(64):
                qnat[ZIGZAG[k]] = q[k]
            wb, hb, _, _ = self.grid[ci]
            stride = wb * 8
            plane = [0] * (stride * hb * 8)
            for byy in range(hb):
                for bxx in range(wb):
                    raw = self.coefs[ci][byy * wb + bxx]
                    px = _idct_block([raw[z] * qnat[z] for z in range(64)])
                    ox, oy = bxx * 8, byy * 8
                    for yy in range(8):
                        base = (oy + yy) * stride + ox
                        row = px[yy * 8 : yy * 8 + 8]
                        for xx in range(8):
                            v = int(round(row[xx] + 128.0))
                            plane[base + xx] = (
                                0 if v < 0 else (255 if v > 255 else v)
                            )
            planes.append(plane)
        return _planes_to_rgb(
            w, h, comps, planes, self.mcux, self.hmax, self.vmax
        )


def _refine_nonzero(reader: _BitReader, coef: list[int], z: int, p1: int) -> None:
    """One correction bit for an already-nonzero coefficient
    (G.1.2.3): magnitude grows by 1 << Al when the bit is set and the
    position wasn't already corrected this pass."""
    if reader.bit() and (coef[z] & p1) == 0:
        coef[z] += p1 if coef[z] >= 0 else -p1


def _ac_first_block(reader, coef, ac_tab, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac_tab.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        coef[ZIGZAG[k]] = reader.receive_extend(s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, coef, ac_tab, ss, se, al, eobrun):
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_tab.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:  # EOB run (includes THIS block's tail bits)
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("AC refine size must be 1")
                val = p1 if reader.bit() else -p1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    _refine_nonzero(reader, coef, z, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                _refine_nonzero(reader, coef, z, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    buf, pos, state: _CoefState, scan_comps, ss, se, ah, al,
    restart_interval,
) -> int:
    """Decode one progressive SOS's entropy data into the coefficient
    store; returns the buffer index of the next marker's 0xFF."""
    reader = _BitReader(buf, pos)
    comps = state.frame[2]
    eobrun = 0
    state.preds = [0] * len(comps)

    def maybe_restart(unit: int) -> None:
        nonlocal eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            _consume_restart(reader)
            state.preds = [0] * len(comps)
            eobrun = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        if len(scan_comps) > 1:  # interleaved: MCU order
            unit = 0
            for my in range(state.mcuy):
                for mx in range(state.mcux):
                    maybe_restart(unit)
                    for ci, dc_tab, _ in scan_comps:
                        _cid, hf, vf, _tq = comps[ci]
                        wb = state.grid[ci][0]
                        for by in range(vf):
                            for bx in range(hf):
                                coef = state.coefs[ci][
                                    (my * vf + by) * wb + (mx * hf + bx)
                                ]
                                _dc_unit(reader, state, ci, dc_tab, coef, ah, al)
                    unit += 1
        else:
            ci, dc_tab, _ = scan_comps[0]
            wb, _hb, nbx, nby = state.grid[ci]
            unit = 0
            for byy in range(nby):
                for bxx in range(nbx):
                    maybe_restart(unit)
                    coef = state.coefs[ci][byy * wb + bxx]
                    _dc_unit(reader, state, ci, dc_tab, coef, ah, al)
                    unit += 1
    else:  # AC scan: single component, non-interleaved (T.81 G.1.1.1)
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        ci, _dc, ac_tab = scan_comps[0]
        if ac_tab is None:
            raise ValueError("AC scan without AC table")
        wb, _hb, nbx, nby = state.grid[ci]
        block_fn = _ac_first_block if ah == 0 else _ac_refine_block
        unit = 0
        for byy in range(nby):
            for bxx in range(nbx):
                maybe_restart(unit)
                coef = state.coefs[ci][byy * wb + bxx]
                eobrun = block_fn(reader, coef, ac_tab, ss, se, al, eobrun)
                unit += 1

    # locate the next marker (skip any trailing RSTn and fill bytes)
    p = reader.pos
    while p + 1 < len(buf):
        if (
            buf[p] == 0xFF
            and buf[p + 1] != 0x00
            and not (0xD0 <= buf[p + 1] <= 0xD7)
            and buf[p + 1] != 0xFF
        ):
            return p
        p += 1
    raise ValueError("no marker after progressive scan")


def _dc_unit(reader, state, ci, dc_tab, coef, ah, al) -> None:
    if ah == 0:  # first DC scan: huffman diff at point transform Al
        if dc_tab is None:
            raise ValueError("DC scan without DC table")
        s = dc_tab.decode(reader)
        state.preds[ci] += reader.receive_extend(s)
        coef[0] = state.preds[ci] << al
    else:  # refinement: one raw bit (two's-complement OR is exact)
        if reader.bit():
            coef[0] |= 1 << al


# ---------------------------------------------------------------------------
# Encoder (fixture producer)
# ---------------------------------------------------------------------------

# spec-valid canonical huffman tables for the encoder. DC: categories
# 0-11 at short lengths. AC: every (run,size) symbol the encoder can
# emit — ZRL (0xF0), EOB (0x00), and runs 0-15 × sizes 1-10 — laid out
# by increasing code length. Validity (prefix-free, counts consistent)
# is asserted at import; the DECODER never uses these (it reads DHT).
_ENC_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))


def _enc_ac_tables() -> tuple[list[int], list[int]]:
    # 162 symbols: sizes 1-10 for runs 0-15, plus 0x00 (EOB) and 0xF0
    # (ZRL). A flat-ish canonical layout: 8-bit codes can hold at most
    # 255 leaves minus reserved space; use lengths 2.. so that all fit.
    symbols = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    # assign: 2 symbols at len 2, 4 at len 4, the rest spread to fit a
    # canonical (Kraft-complete-or-under) code
    bits = [0] * 16
    bits[1] = 1   # len 2: EOB
    bits[3] = 3   # len 4: ZRL + the two most common (run,size)
    bits[7] = 60  # len 8
    bits[8] = 98  # len 9
    assert sum(bits) == len(symbols)
    # Kraft check: must be < 1 to stay prefix-free with the marker rule
    kraft = sum(n / (1 << (i + 1)) for i, n in enumerate(bits))
    assert kraft <= 1.0, kraft
    return bits, symbols


_ENC_AC_BITS, _ENC_AC_VALS = _enc_ac_tables()


def _enc_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_AC_CODES = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)

#: flat quant tables: DC step 16 makes "constant even fill decodes to
#: itself" hold exactly (8*(v-128) divisible by 16 for even v) — the
#: property the MJPEG oracle depends on.
_ENC_QT = [16] * 64


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur, self.nbits = 0, 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur, self.nbits = 0, 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def encode_baseline_jpeg(rgb: bytes, width: int, height: int) -> bytes:
    """Encode raw RGB24 to a baseline JFIF bitstream (4:4:4, flat quant,
    canonical huffman). Edge blocks are padded by edge replication."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    # color convert to full planes
    planes = [[0.0] * (width * height) for _ in range(3)]
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        planes[0][i] = 0.299 * r + 0.587 * g + 0.114 * b
        planes[1][i] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        planes[2][i] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    writer = _BitWriter()
    preds = [0, 0, 0]
    bx_n, by_n = -(-width // 8), -(-height // 8)
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(3):
                block = [0.0] * 64
                for yy in range(8):
                    sy = min(by * 8 + yy, height - 1)
                    for xx in range(8):
                        sx = min(bx * 8 + xx, width - 1)
                        block[yy * 8 + xx] = planes[ci][sy * width + sx] - 128.0
                coef = _fdct_block(block)
                zz = [
                    int(round(coef[ZIGZAG[k]] / _ENC_QT[k])) for k in range(64)
                ]
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                s = _category(diff)
                length, code = _DC_CODES[s]
                writer.write(length, code)
                if s:
                    writer.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
                run = 0
                last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        zl, zc = _AC_CODES[0xF0]
                        writer.write(zl, zc)
                        run -= 16
                    s = _category(zz[k])
                    al, ac = _AC_CODES[(run << 4) | s]
                    writer.write(al, ac)
                    v = zz[k]
                    writer.write(s, v if v >= 0 else v + (1 << s) - 1)
                    run = 0
                if last_nz < 63:
                    el, ec = _AC_CODES[0x00]
                    writer.write(el, ec)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt_body = bytes([0x00]) + bytes(_ENC_QT)
    sof = (
        bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    )
    dht = (
        bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    )
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, qt_body)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + bytes(writer.out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Progressive encoder (fixture producer for the SOF2 decode path)
# ---------------------------------------------------------------------------


def encode_progressive_jpeg(rgb: bytes, width: int, height: int) -> bytes:
    """Encode raw RGB24 to a PROGRESSIVE JFIF bitstream (SOF2, 4:4:4,
    flat quant, the same canonical huffman tables as the baseline
    encoder) with the classic scan script: interleaved DC-first at
    Al=1, DC refinement to Al=0, then one full-precision spectral AC
    scan per component (Ss=1..63). Spec-valid successive approximation
    on DC + spectral selection on AC; AC refinement is exercised by a
    hand-built bitstream in the tests (the decoder supports all four
    scan types). Flat DC quant step 16 keeps the even-fill exactness
    property the MJPEG oracle depends on — the DC point transform drops
    bit 0 in scan 1 and the refinement scan restores it exactly."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    planes = [[0.0] * (width * height) for _ in range(3)]
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        planes[0][i] = 0.299 * r + 0.587 * g + 0.114 * b
        planes[1][i] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        planes[2][i] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    bx_n, by_n = -(-width // 8), -(-height // 8)
    zzs: list[list[list[int]]] = [[], [], []]
    for by in range(by_n):
        for bx in range(bx_n):
            for ci in range(3):
                block = [0.0] * 64
                for yy in range(8):
                    sy = min(by * 8 + yy, height - 1)
                    for xx in range(8):
                        sx = min(bx * 8 + xx, width - 1)
                        block[yy * 8 + xx] = planes[ci][sy * width + sx] - 128.0
                coef = _fdct_block(block)
                zzs[ci].append(
                    [int(round(coef[ZIGZAG[k]] / _ENC_QT[k])) for k in range(64)]
                )

    nblocks = bx_n * by_n

    def dc_first() -> bytes:
        w = _BitWriter()
        preds = [0, 0, 0]
        for b in range(nblocks):  # MCU order == block order at 4:4:4
            for ci in range(3):
                v = zzs[ci][b][0] >> 1  # point transform Al=1
                diff = v - preds[ci]
                preds[ci] = v
                s = _category(diff)
                length, code = _DC_CODES[s]
                w.write(length, code)
                if s:
                    w.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
        w.flush()
        return bytes(w.out)

    def dc_refine() -> bytes:
        w = _BitWriter()
        for b in range(nblocks):
            for ci in range(3):
                w.write(1, zzs[ci][b][0] & 1)
        w.flush()
        return bytes(w.out)

    def ac_full(ci: int) -> bytes:
        w = _BitWriter()
        for b in range(nblocks):
            zz = zzs[ci][b]
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    zl, zc = _AC_CODES[0xF0]
                    w.write(zl, zc)
                    run -= 16
                s = _category(zz[k])
                al_, ac_ = _AC_CODES[(run << 4) | s]
                w.write(al_, ac_)
                v = zz[k]
                w.write(s, v if v >= 0 else v + (1 << s) - 1)
                run = 0
            if last_nz < 63:
                el, ec = _AC_CODES[0x00]  # EOB == EOBRUN of 1
                w.write(el, ec)
        w.flush()
        return bytes(w.out)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt_body = bytes([0x00]) + bytes(_ENC_QT)
    sof2 = (
        bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    )
    dht = (
        bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    )
    out = bytearray(
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, qt_body)
        + seg(0xC2, sof2)
        + seg(0xC4, dht)
    )
    # scan 1: DC first, interleaved, Ah=0 Al=1
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    out += dc_first()
    # scan 2: DC refinement, Ah=1 Al=0
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    out += dc_refine()
    # scans 3-5: full-precision AC per component, Ss=1 Se=63
    for ci in range(3):
        out += seg(0xDA, bytes([1, ci + 1, 0x00, 1, 63, 0x00]))
        out += ac_full(ci)
    out += b"\xff\xd9"
    return bytes(out)
