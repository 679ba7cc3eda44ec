"""Minimal baseline + progressive JPEG ENCODER — test-fixture
generator only.

Produces spec-conformant baseline sequential JPEGs (SOF0, 4:4:4 or
grayscale, ITU-T T.81 Annex K example quantization + Huffman tables,
optional restart markers) and PROGRESSIVE JPEGs (SOF2, Annex G:
spectral selection + successive approximation with DC/AC first and
refinement scans, cross-block EOB runs) so the decoder in
operators/multimodal.py can be exercised without any codec library in
the container. Encoder and decoder share no code beyond the public
zigzag constant — the round-trip test would not cancel a mirrored bug
in the DCT, the entropy coder, or the table plumbing, because this
side implements the FORWARD transforms from the spec text
independently. ``encode_jpeg_progressive`` quantizes identically to
``encode_jpeg``, so progressive decode must match baseline decode
EXACTLY, pixel for pixel — the round-trip oracle the progressive
tests pin.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1 example quantization tables (zigzag order applied at
# write time; stored here in natural row-major order).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# T.81 Annex K.3 example Huffman tables: (BITS counts[16], HUFFVAL).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _codes(bits, vals):
    """Canonical code assignment (T.81 C.2): {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _fdct(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT-II (T.81 A.3.3), written as the direct double
    sum — deliberately NOT the matrix form the decoder uses."""
    out = np.empty((8, 8))
    xs = np.arange(8)
    for u in range(8):
        cu = np.sqrt(0.5) if u == 0 else 1.0
        cos_u = np.cos((2 * xs + 1) * u * np.pi / 16.0)
        for v in range(8):
            cv = np.sqrt(0.5) if v == 0 else 1.0
            cos_v = np.cos((2 * xs + 1) * v * np.pi / 16.0)
            out[u, v] = 0.25 * cu * cv * float(
                (block * np.outer(cos_u, cos_v)).sum()
            )
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0


def _magnitude(v: int) -> tuple:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    amp = v if v > 0 else v + (1 << s) - 1
    return s, amp


def _encode_block(w, coef_zz, pred, dc_codes, ac_codes):
    dc = int(coef_zz[0])
    size, amp = _magnitude(dc - pred)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(amp, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, amp = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(amp, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate ``plane`` up to (ph, pw)."""
    h, w = plane.shape
    out = np.empty((ph, pw))
    out[:h, :w] = plane
    if h < ph:
        out[h:, :w] = plane[h - 1, :]
    if w < pw:
        out[:, w:] = out[:, w - 1 : w]
    return out


def _box_down(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-average downsample by integer factors (chroma subsampling)."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    p = _pad_to(plane, -(-h // fy) * fy, -(-w // fx) * fx)
    return p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
        axis=(1, 3)
    )


def encode_jpeg(
    px: np.ndarray, quality_scale: float = 1.0, grayscale: bool = False,
    restart: int = 0, subsample: tuple = (1, 1),
    sos_order: tuple | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JPEG bytes (SOF0, Annex K tables
    scaled by ``quality_scale`` and clamped to [1, 255], optional
    DRI/RSTn every ``restart`` MCUs). ``subsample=(v, h)`` sets the
    LUMA sampling factors relative to chroma — (1, 1) is 4:4:4,
    (1, 2) is 4:2:2, (2, 2) is 4:2:0 (box-averaged chroma).
    ``sos_order`` permutes the SCAN's component order (indices into
    the Y/Cb/Cr component list; the MCU interleave follows it, per
    T.81 the scan order is the writer's choice) — decoders that map
    planes by scan position instead of component id color-swap on
    anything but the default (0, 1, 2)."""
    h, w = px.shape[:2]
    f = px.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    sv, sh = subsample
    if grayscale:
        comps = [(y, 1, 1)]
    else:
        comps = [
            (y, sh, sv),
            (_box_down(cb, sv, sh), 1, 1),
            (_box_down(cr, sv, sh), 1, 1),
        ]
    nc = len(comps)
    qts = [np.clip(np.round(QT_LUMA * quality_scale), 1, 255)]
    if not grayscale:
        qts.append(np.clip(np.round(QT_CHROMA * quality_scale), 1, 255))

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT segments
    for tq, q in enumerate(qts):
        zz = bytes(int(q[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + zz
    # SOF0
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci, (_, ch, cv) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, min(ci, 1)])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT segments
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not grayscale:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tid, (bits, vals) in tables:
        body = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if restart:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart.to_bytes(2, "big")
    # SOS
    order = tuple(sos_order) if sos_order is not None else tuple(range(nc))
    assert sorted(order) == list(range(nc)), "sos_order must permute comps"
    sos = bytes([nc])
    for ci in order:
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    hmax = max(ch for _, ch, _ in comps)
    vmax = max(cv for _, _, cv in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # pad each component plane to its full MCU-grid size
    padded = [
        _pad_to(p, mcuy * cv * 8, mcux * ch * 8) for p, ch, cv in comps
    ]
    dc_code_sets = [_codes(*HUFF_DC_LUMA)] + (
        [] if grayscale else [_codes(*HUFF_DC_CHROMA)] * 2
    )
    ac_code_sets = [_codes(*HUFF_AC_LUMA)] + (
        [] if grayscale else [_codes(*HUFF_AC_CHROMA)] * 2
    )
    preds = [0] * nc
    wtr = _BitWriter()
    mcu_i = 0
    rst = 0
    for by in range(mcuy):
        for bx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                wtr.flush()
                out += wtr.out
                wtr = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * nc
            for ci in order:
                _, ch, cv = comps[ci]
                plane = padded[ci]
                for r in range(cv):
                    for c in range(ch):
                        y0 = (by * cv + r) * 8
                        x0 = (bx * ch + c) * 8
                        blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                        coef = _fdct(blk - 128.0)
                        q = qts[min(ci, len(qts) - 1)]
                        quant = np.round(coef / q.reshape(8, 8)).astype(
                            np.int64
                        )
                        zz = quant.ravel()[ZIGZAG]
                        preds[ci] = _encode_block(
                            wtr, zz, preds[ci],
                            dc_code_sets[ci], ac_code_sets[ci],
                        )
            mcu_i += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------- progressive (SOF2)

# Progressive-scan Huffman tables: flat canonical tables holding every
# symbol the progressive encoder may emit (Annex K's sequential AC
# tables lack the EOBn run symbols progressive scans need). DC sizes
# 0..11 at 4 bits; AC run/size + ZRL + EOB0..EOB14 at 8 bits.
PROG_DC = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
_PROG_AC_VALS = (
    [n << 4 for n in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC = ([0] * 7 + [len(_PROG_AC_VALS)] + [0] * 8, _PROG_AC_VALS)


class _ProgScan:
    """Per-scan entropy state: bit writer + cross-block EOB run with
    its buffered correction bits (T.81 G.1.2.2/G.1.2.3 encoder)."""

    def __init__(self, ac_codes):
        self.w = _BitWriter()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending = []  # correction bits owed to the pending EOB run

    def flush_eob(self):
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            code, ln = self.ac_codes[n << 4]
            self.w.write(code, ln)
            if n:
                self.w.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []


def _emit_ac_first(st: _ProgScan, zz, ss, se, al, ac_codes):
    """AC first scan, one block (G.1.2.2): point-transformed run/size
    coding with EOB-run accumulation across blocks."""
    t = [0] * 64
    last = ss - 1
    for k in range(ss, se + 1):
        v = int(zz[k])
        tv = abs(v) >> al  # AC point transform is sign-magnitude
        if tv:
            t[k] = tv if v > 0 else -tv
            last = k
    if last < ss:  # whole band zero at this precision: join EOB run
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()
        return
    st.flush_eob()
    run = 0
    for k in range(ss, last + 1):
        v = t[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            st.w.write(code, ln)
            run -= 16
        size, amp = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        st.w.write(code, ln)
        st.w.write(amp, size)
        run = 0
    if last < se:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def _emit_ac_refine(st: _ProgScan, zz, ss, se, al, ac_codes):
    """AC refinement scan, one block (G.1.2.3): newly-nonzero
    coefficients code (zero-history-run, 1) + sign; previously-nonzero
    coefficients contribute one buffered correction bit, emitted after
    the symbol whose decode pass crosses them (ZRL flushing at the
    first nonzero coefficient once >15 zero-history positions are
    pending keeps encoder bit order identical to the decoder's
    coefficient walk)."""
    absv = [0] * 64
    eobpos = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv[k] = t
        if t == 1:  # newly nonzero at this precision level
            eobpos = k
    run = 0
    br = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eobpos:
            st.flush_eob()
            code, ln = ac_codes[0xF0]
            st.w.write(code, ln)
            run -= 16
            for b in br:
                st.w.write(b, 1)
            br = []
        if t > 1:  # previously nonzero: one correction bit, run unbroken
            br.append(t & 1)
            continue
        st.flush_eob()
        code, ln = ac_codes[(run << 4) | 1]
        st.w.write(code, ln)
        st.w.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in br:
            st.w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:  # trailing zeros/corrections fold into the EOB run
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def encode_jpeg_progressive(
    px: np.ndarray, quality_scale: float = 1.0, grayscale: bool = False,
    subsample: tuple = (1, 1), restart: int = 0,
    scan_script: list | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive JPEG bytes (SOF2). Same
    color transform, subsampling, and quantization as
    :func:`encode_jpeg`, so both encodings carry IDENTICAL quantized
    coefficients once every scan has landed. ``scan_script`` entries
    are ``(comp_indices, Ss, Se, Ah, Al)``; the default script
    exercises interleaved DC first + refinement, per-component AC
    spectral bands, and two levels of successive approximation."""
    h, w = px.shape[:2]
    f = px.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    sv, sh = subsample
    if grayscale:
        comps = [(y, 1, 1)]
    else:
        comps = [
            (y, sh, sv),
            (_box_down(cb, sv, sh), 1, 1),
            (_box_down(cr, sv, sh), 1, 1),
        ]
    nc = len(comps)
    qts = [np.clip(np.round(QT_LUMA * quality_scale), 1, 255)]
    if not grayscale:
        qts.append(np.clip(np.round(QT_CHROMA * quality_scale), 1, 255))
    hmax = max(ch for _, ch, _ in comps)
    vmax = max(cv for _, _, cv in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # per-component quantized zigzag coefficients over the padded MCU
    # grid, plus each component's own (non-interleaved) block dims
    grids, own = [], []
    for ci, (plane, ch, cv) in enumerate(comps):
        ph, pw = plane.shape
        own.append((-(-ph // 8), -(-pw // 8)))
        padded = _pad_to(plane, mcuy * cv * 8, mcux * ch * 8)
        gh, gw = mcuy * cv, mcux * ch
        grid = np.empty((gh, gw, 64), dtype=np.int64)
        q = qts[min(ci, len(qts) - 1)].reshape(8, 8)
        for by in range(gh):
            for bx in range(gw):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                quant = np.round(_fdct(blk - 128.0) / q).astype(np.int64)
                grid[by, bx] = quant.ravel()[ZIGZAG]
        grids.append(grid)

    if scan_script is None:
        if grayscale:
            scan_script = [
                ((0,), 0, 0, 0, 1),
                ((0,), 1, 5, 0, 2),
                ((0,), 6, 63, 0, 2),
                ((0,), 1, 63, 2, 1),
                ((0,), 0, 0, 1, 0),
                ((0,), 1, 63, 1, 0),
            ]
        else:
            scan_script = [
                ((0, 1, 2), 0, 0, 0, 1),
                ((0,), 1, 5, 0, 2),
                ((2,), 1, 63, 0, 1),
                ((1,), 1, 63, 0, 1),
                ((0,), 6, 63, 0, 2),
                ((0,), 1, 63, 2, 1),
                ((0, 1, 2), 0, 0, 1, 0),
                ((0,), 1, 63, 1, 0),
                ((2,), 1, 63, 1, 0),
                ((1,), 1, 63, 1, 0),
            ]

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qts):
        zzq = bytes(int(q[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + zzq
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci, (_, ch, cv) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, min(ci, 1)])
    out += b"\xff\xc2" + (len(sof) + 2).to_bytes(2, "big") + sof
    for tid, (bits, vals) in ((0x00, PROG_DC), (0x10, PROG_AC)):
        body = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if restart:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart.to_bytes(2, "big")
    dc_codes = _codes(*PROG_DC)
    ac_codes = _codes(*PROG_AC)

    for sel, ss, se, ah, al in scan_script:
        sos = bytes([len(sel)])
        for ci in sel:
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
        # unit list: MCUs when interleaved, own-grid blocks otherwise
        if len(sel) > 1:
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for ci in sel:
                        _, ch, cv = comps[ci]
                        for r in range(cv):
                            for cc in range(ch):
                                blocks.append((ci, my * cv + r, mx * ch + cc))
                    units.append(blocks)
        else:
            ci = sel[0]
            bh, bw = own[ci]
            units = [[(ci, by, bx)] for by in range(bh) for bx in range(bw)]
        st = _ProgScan(ac_codes)
        preds = {ci: 0 for ci in sel}
        rst = 0
        for u, blocks in enumerate(units):
            if restart and u and u % restart == 0:
                st.flush_eob()
                st.w.flush()
                out += st.w.out
                st.w = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = {ci: 0 for ci in sel}
            for ci, by, bx in blocks:
                zz = grids[ci][by, bx]
                if ss == 0:  # DC scan
                    if ah == 0:
                        val = int(zz[0]) >> al  # DC transform: arith shift
                        size, amp = _magnitude(val - preds[ci])
                        code, ln = dc_codes[size]
                        st.w.write(code, ln)
                        if size:
                            st.w.write(amp, size)
                        preds[ci] = val
                    else:
                        st.w.write((int(zz[0]) >> al) & 1, 1)
                elif ah == 0:
                    _emit_ac_first(st, zz, ss, se, al, ac_codes)
                else:
                    _emit_ac_refine(st, zz, ss, se, al, ac_codes)
        st.flush_eob()
        st.w.flush()
        out += st.w.out
    out += b"\xff\xd9"
    return bytes(out)
