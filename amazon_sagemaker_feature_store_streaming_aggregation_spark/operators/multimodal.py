"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata structs. The Spark-side contract — schema, partition-preserving
``mapInPandas`` with Arrow batches, UDF signatures, batch shapes — is
real and tested; the actual codec calls are stubbed (the decode
libraries are not in this container): ``decoder='stub'`` raises
``NotImplementedError`` exactly where a real decoder plugs in, and
``decoder='fake'`` is a deterministic md5-seeded fake used by tests.

Scale: mapInPandas streams Arrow batches through Python one partition
at a time — no collect, no shuffle; metadata-only transformations
(filtering by width, sampling frames by index) stay JVM-side because
the metadata is a plain struct column, so predicate pushdown and
column pruning still apply to everything except the opaque payload.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# decode work must not serialize onto one task when the input is an
# under-split local file (a 100 TB media table has thousands of
# splits and passes through untouched — the dedup.py guard's rule)
from .dedup import _parallelize_scan

#: media payload + typed metadata (one row per asset)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = "media_id long, kind string, features array<double>"


def synth_media(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (text bytes as payload + synthetic metadata) — test fixture only."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 16).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.pmod(F.col("doc_id"), F.lit(30)) + 1).cast("int").alias("n_frames"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic md5-seeded 'decoded feature' vector (stands in for
    decode -> resize -> embed; same contract, fake math)."""
    if payload is None:
        return np.zeros(dim)
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:8], "big", signed=False)
    rng = np.random.default_rng(seed)
    return rng.random(dim)


def _decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) -> (h, w, 3) uint8 array. Pure
    parsing, no codec library."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed between them
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def _decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB array (rows are
    stored bottom-up, BGR, 4-byte-padded). Pure header parsing."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * abs(h), offset=off
    ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def _png_defilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4) -> (h, w*ch) bytes.

    Up/None rows are whole-row numpy ops; Sub/Average/Paeth carry a
    left-neighbor dependency, so those run a per-byte loop along x —
    fine for a correctness-first decoder (rows are short relative to
    the Arrow batch, and the hot path stays per-asset parallel via
    mapInPandas partitions).
    """
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype, line = int(raw[y, 0]), raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = out[y]
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + left) & 0xFF
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def _decode_png(data: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8 RGB, pure stdlib (``zlib`` inflate +
    defilter) — no codec library. Supports the deterministic subset a
    synthetic pipeline emits: 8-bit depth, grayscale (0), RGB (2) and
    RGBA (6) color types, non-interlaced. Grayscale broadcasts to 3
    channels; alpha is dropped (features are computed over RGB)."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG subset: 8-bit non-interlaced only (depth={depth}, "
            f"interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if ch is None:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (w * ch + 1):
        raise ValueError("PNG scanline payload has unexpected size")
    px = _png_defilter(raw, h, w, ch).reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]


# ------------------------------------- baseline + progressive JPEG decode
#
# Pure numpy/stdlib implementation of ITU-T T.81 DCT decoding (the
# public-spec algorithm: marker parse -> canonical Huffman entropy
# decode -> dequantize -> dezigzag -> 8x8 IDCT -> chroma upsample ->
# JFIF YCbCr->RGB). Supported: 8-bit baseline (SOF0), extended-
# sequential (SOF1), and PROGRESSIVE (SOF2, T.81 Annex G: spectral
# selection + successive approximation, DC/AC first and refinement
# scans, cross-block EOB runs) Huffman JPEGs, grayscale or
# 3-component, any sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...),
# restart markers, 8/16-bit quant tables, multi-table DQT/DHT
# segments. The NotImplementedError boundary retreats to
# lossless/hierarchical and arithmetic-coded streams.
#
# Correctness-first: the entropy decode walks bits in Python, so this
# path is for fixture-scale corpora and pipeline verification; a
# production deployment swaps in libjpeg-turbo at the same
# _IMAGE_DECODERS plug point without touching any Spark plumbing.

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: 8x8 DCT-II basis M[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
#: inverse transform is f = M.T @ F @ M (T.81 A.3.3).
_IDCT_M = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _jpeg_build_huff(counts: list, symbols: bytes) -> dict:
    """Canonical Huffman table (T.81 C.2): {(bit_length, code): symbol}."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over one destuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes):
        self.data, self.pos, self.buf, self.n = data, 0, 0, 0

    def bit(self) -> int:
        if not self.n:
            if self.pos >= len(self.data):
                # past segment end: T.81 pads with 1-bits
                return 1
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")

    def receive_extend(self, s: int) -> int:
        if not s:
            return 0
        v = self.bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_scan_segments(data: bytes, pos: int) -> tuple:
    """Split the entropy-coded stream at ``pos`` into destuffed
    (0xFF00 -> 0xFF) segments separated by RST markers; returns
    (segments, end_pos) with end_pos at the 0xFF of the terminating
    marker."""

    def destuff(seg: bytes) -> bytes:
        return seg.replace(b"\xff\x00", b"\xff")

    segs, start = [], pos
    i = pos
    while True:
        b = data.find(b"\xff", i)
        if b < 0 or b + 1 >= len(data):
            segs.append(destuff(data[start:]))
            return segs, len(data)
        nxt = data[b + 1]
        if nxt == 0x00 or nxt == 0xFF:
            i = b + 2 if nxt == 0x00 else b + 1
            continue
        if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segs.append(destuff(data[start:b]))
            start = i = b + 2
            continue
        segs.append(destuff(data[start:b]))
        return segs, b


def _decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> (h, w, 3) uint8 RGB (see block
    comment above)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict = {}
    hdc: dict = {}
    hac: dict = {}
    frame = None
    restart = 0
    planes = None
    comps: list = []
    progressive = False
    prog_scans = 0
    geom: dict = {}
    pos = 2
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        m = data[pos + 1]
        pos += 2
        if m == 0xFF:  # fill byte
            pos -= 1
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone
            continue
        ln = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + ln]
        pos += ln
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    t = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.float64
                    )
                    i += 128
                else:
                    t = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    i += 64
                qt[tq] = t  # zigzag order, dequant pairs with dezigzag
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                tab = _jpeg_build_huff(counts, seg[i + 17 : i + 17 + n])
                (hdc if tc == 0 else hac)[th] = tab
                i += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            prec, h_img, w_img, nc = (
                seg[0],
                int.from_bytes(seg[1:3], "big"),
                int.from_bytes(seg[3:5], "big"),
                seg[5],
            )
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = (h_img, w_img)
            progressive = m == 0xC2
            if progressive:
                # coefficient accumulator, filled scan by scan (Annex G):
                # per component one (padded-block-grid, 64) int32 array in
                # ZIGZAG order — successive-approximation bit ops need
                # integer coefficients, dezigzag happens at finish
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w_img // (8 * hmax))
                mcuy = -(-h_img // (8 * vmax))
                geom = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy}
                for c in comps:
                    c["bw_pad"] = mcux * c["h"]
                    c["bh_pad"] = mcuy * c["v"]
                    # non-interleaved scans cover the component's OWN
                    # block grid (T.81 A.2.2), not the MCU-padded one
                    sw = -(-(w_img * c["h"]) // hmax)
                    sh = -(-(h_img * c["v"]) // vmax)
                    c["bw"] = -(-sw // 8)
                    c["bh"] = -(-sh // 8)
                    c["coef"] = np.zeros(
                        (c["bh_pad"] * c["bw_pad"], 64), dtype=np.int32
                    )
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{m:02x} (lossless/hierarchical/"
                "arithmetic) unsupported — baseline sequential only"
            )
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                comp = next(
                    (c for c in comps if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"corrupt JPEG: scan component {cs} not in frame"
                    )
                scan.append((comp, tt >> 4, tt & 15))
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
                segs, pos = _jpeg_scan_segments(data, pos)
                _jpeg_progressive_scan(
                    segs, scan, hdc, hac, geom, ss, se, ah, al, restart
                )
                prog_scans += 1
                continue
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG unsupported"
                )
            segs, pos = _jpeg_scan_segments(data, pos)
            planes = _jpeg_decode_scan(
                segs, scan, qt, hdc, hac, frame, restart
            )
            scan_ids = [c["id"] for c, _, _ in scan]
        # APPn/COM and anything else: skipped
    if progressive and prog_scans:
        planes = [_jpeg_finish_component(c, qt, geom) for c in comps]
        scan_ids = [c["id"] for c in comps]
    if planes is None:
        raise ValueError("corrupt JPEG: no scan decoded")
    h_img, w_img = frame
    if len(planes) == 1:
        y = np.clip(np.round(planes[0][:h_img, :w_img]), 0, 255).astype(
            np.uint8
        )
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError("JPEG with 2 or 4+ components unsupported")
    # Y/Cb/Cr assignment is by COMPONENT ID, not SOS scan position: T.81
    # puts no order constraint on the scan's component list, so a writer
    # emitting e.g. (Cr, Cb, Y) would otherwise color-swap silently.
    # JFIF (the only 3-component flavor this decoder claims) fixes the
    # ids as Y=1, Cb=2, Cr=3; anything else is out of scope, loudly.
    if sorted(scan_ids) != [1, 2, 3]:
        raise NotImplementedError(
            f"non-JFIF 3-component ids {sorted(scan_ids)} unsupported "
            "(JFIF Y=1/Cb=2/Cr=3 only)"
        )
    by_id = dict(zip(scan_ids, planes))
    y, cb, cr = (by_id[cid][:h_img, :w_img] for cid in (1, 2, 3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _jpeg_decode_scan(
    segs: list, scan: list, qt: dict, hdc: dict, hac: dict,
    frame: tuple, restart: int,
) -> list:
    """Interleaved-scan MCU loop: Huffman-decode every block, then
    dequantize/dezigzag/IDCT all blocks per component in ONE vectorized
    numpy pass, place into full-resolution planes (chroma replicated up
    by its sampling ratio)."""
    h_img, w_img = frame
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    n_mcu = mcux * mcuy
    coefs = [
        np.zeros((n_mcu * c["h"] * c["v"], 64), dtype=np.float64)
        for c, _, _ in scan
    ]
    mcu, seg_i = 0, 0
    br = _JpegBits(segs[0])
    preds = [0] * len(scan)
    while mcu < n_mcu:
        if restart and mcu and mcu % restart == 0 and seg_i + 1 < len(segs):
            seg_i += 1
            br = _JpegBits(segs[seg_i])
            preds = [0] * len(scan)
        for ci, (c, td, ta) in enumerate(scan):
            try:
                dct, act = hdc[td], hac[ta]
            except KeyError as exc:  # selector with no DHT segment
                raise ValueError(
                    f"corrupt JPEG: undefined Huffman table {exc}"
                ) from None
            for b in range(c["h"] * c["v"]):
                row = coefs[ci][mcu * c["h"] * c["v"] + b]
                s = br.huff(dct)
                preds[ci] += br.receive_extend(s)
                row[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = br.huff(act)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("corrupt JPEG: AC index overrun")
                    row[k] = br.receive_extend(s)
                    k += 1
        mcu += 1
    planes = []
    for ci, (c, _, _) in enumerate(scan):
        if c["tq"] not in qt:  # selector with no DQT segment
            raise ValueError(
                f"corrupt JPEG: undefined quant table {c['tq']}"
            )
        deq = coefs[ci] * qt[c["tq"]][None, :]  # both in zigzag order
        nat = np.zeros_like(deq)
        nat[:, _ZIGZAG] = deq  # dezigzag
        blocks = nat.reshape(-1, 8, 8)
        px = np.einsum("ux,nuv,vy->nxy", _IDCT_M, blocks, _IDCT_M) + 128.0
        # blocks -> (mcuy, mcux, v, h, 8, 8) -> component plane
        plane = (
            px.reshape(mcuy, mcux, c["v"], c["h"], 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * c["v"] * 8, mcux * c["h"] * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane)
    return planes


def _jpeg_ac_first(br, row, act, ss, se, al, eobrun) -> int:
    """Progressive AC first scan, one block (T.81 G.1.2.2 decode):
    run-length coefficients scaled up by the point transform, with
    cross-block EOB runs. Returns the updated EOB run."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:  # EOBn: run of 2^r + ext blocks ending here
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC index overrun")
        row[k] = br.receive_extend(s) << al
        k += 1
    return eobrun


def _jpeg_ac_refine(br, row, act, ss, se, al, eobrun) -> int:
    """Progressive AC refinement scan, one block (T.81 G.1.2.3
    decode): zero-history runs position newly-nonzero ±2^al
    coefficients; every previously-nonzero coefficient crossed (and,
    on EOB blocks, every one remaining in the band) reads one
    correction bit appending 2^al to its magnitude. Returns the
    updated EOB run."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.huff(act)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "corrupt JPEG: refinement magnitude size != 1"
                    )
                newval = p1 if br.bit() else m1
            while k <= se:
                v = int(row[k])
                if v != 0:
                    if br.bit() and (v & p1) == 0:
                        row[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise ValueError("corrupt JPEG: AC index overrun")
                row[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(row[k])
            if v != 0:
                if br.bit() and (v & p1) == 0:
                    row[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_scan(
    segs: list, scan: list, hdc: dict, hac: dict, geom: dict,
    ss: int, se: int, ah: int, al: int, restart: int,
) -> None:
    """One progressive scan (T.81 Annex G): fill/refine the scan
    components' integer coefficient accumulators in place. DC scans
    (Ss=0) may interleave components over the frame's MCU grid; AC
    scans are single-component over that component's own block grid.
    Restart intervals reset DC predictors and the EOB run."""
    if ss > se or se > 63:
        raise ValueError("corrupt JPEG: bad spectral selection")
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: progressive DC scan needs Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError(
            "corrupt JPEG: progressive AC scan must be single-component"
        )
    dc_scan = ss == 0
    interleaved = len(scan) > 1
    if interleaved:
        n_units = geom["mcux"] * geom["mcuy"]
    else:
        c0 = scan[0][0]
        n_units = c0["bh"] * c0["bw"]
    dct = []
    act = None
    if dc_scan and ah == 0:
        for _, td, _ in scan:
            try:
                dct.append(hdc[td])
            except KeyError as exc:
                raise ValueError(
                    f"corrupt JPEG: undefined Huffman table {exc}"
                ) from None
    if not dc_scan:
        ta0 = scan[0][2]
        try:
            act = hac[ta0]
        except KeyError as exc:
            raise ValueError(
                f"corrupt JPEG: undefined Huffman table {exc}"
            ) from None
    seg_i = 0
    br = _JpegBits(segs[0])
    preds = [0] * len(scan)
    eobrun = 0
    for u in range(n_units):
        if restart and u and u % restart == 0 and seg_i + 1 < len(segs):
            seg_i += 1
            br = _JpegBits(segs[seg_i])
            preds = [0] * len(scan)
            eobrun = 0
        if dc_scan and interleaved:
            my, mx = divmod(u, geom["mcux"])
            for ci, (c, _, _) in enumerate(scan):
                for r in range(c["v"]):
                    for col in range(c["h"]):
                        idx = (
                            (my * c["v"] + r) * c["bw_pad"]
                            + mx * c["h"] + col
                        )
                        row = c["coef"][idx]
                        if ah == 0:
                            s = br.huff(dct[ci])
                            preds[ci] += br.receive_extend(s)
                            row[0] = preds[ci] << al
                        elif br.bit():
                            row[0] = int(row[0]) | (1 << al)
        else:
            c = scan[0][0]
            by, bx = divmod(u, c["bw"])
            row = c["coef"][by * c["bw_pad"] + bx]
            if dc_scan:
                if ah == 0:
                    s = br.huff(dct[0])
                    preds[0] += br.receive_extend(s)
                    row[0] = preds[0] << al
                elif br.bit():
                    row[0] = int(row[0]) | (1 << al)
            elif ah == 0:
                eobrun = _jpeg_ac_first(br, row, act, ss, se, al, eobrun)
            else:
                eobrun = _jpeg_ac_refine(br, row, act, ss, se, al, eobrun)


def _jpeg_finish_component(c: dict, qt: dict, geom: dict) -> np.ndarray:
    """Accumulated progressive coefficients -> full-resolution sample
    plane: dequantize (zigzag-paired), dezigzag, vectorized IDCT,
    block-grid placement, chroma replication — the same math as the
    baseline scan tail, over the per-component block-row-major store."""
    if c["tq"] not in qt:
        raise ValueError(f"corrupt JPEG: undefined quant table {c['tq']}")
    deq = c["coef"].astype(np.float64) * qt[c["tq"]][None, :]
    nat = np.zeros_like(deq)
    nat[:, _ZIGZAG] = deq
    blocks = nat.reshape(-1, 8, 8)
    px = np.einsum("ux,nuv,vy->nxy", _IDCT_M, blocks, _IDCT_M) + 128.0
    plane = (
        px.reshape(c["bh_pad"], c["bw_pad"], 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(c["bh_pad"] * 8, c["bw_pad"] * 8)
    )
    return np.repeat(
        np.repeat(plane, geom["vmax"] // c["v"], axis=0),
        geom["hmax"] // c["h"],
        axis=1,
    )


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV/PCM -> (samples as float64 in [-1, 1] mono-mixed, rate).
    Stdlib ``wave`` module — a real container/codec, no external libs."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, rate


def _image_features(px: np.ndarray, dim: int) -> np.ndarray:
    h, w = px.shape[0], px.shape[1]
    flat = px.reshape(-1, 3).astype(np.float64)
    v = np.array(
        [
            float(w),
            float(h),
            *flat.mean(axis=0),  # per-channel means
            *flat.std(axis=0),  # per-channel stds
            float(flat.min()),
            float(flat.max()),
            float(np.median(flat)),
        ]
    )
    return np.pad(v, (0, max(0, dim - len(v))))[:dim]


def _audio_features(x: np.ndarray, rate: int, dim: int) -> np.ndarray:
    n = len(x)
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    # Spectral features from one rfft over the clip (numpy is baked in;
    # per-clip cost is O(n log n) inside the same Arrow batch). The
    # magnitude spectrum excludes the DC bin so a constant offset
    # doesn't masquerade as a dominant tone.
    dom_hz = centroid_hz = 0.0
    if n > 1 and rate:
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        if len(mag) > 1:
            m1, f1 = mag[1:], freqs[1:]
            tot = float(m1.sum())
            if tot > 0:  # silence has no dominant tone
                dom_hz = float(f1[int(np.argmax(m1))])
                centroid_hz = float((f1 * m1).sum() / tot)
    v = np.array(
        [
            float(n),
            float(rate),
            n / rate if rate else 0.0,  # duration s
            float(x.mean()) if n else 0.0,
            float(np.sqrt(np.mean(x * x))) if n else 0.0,  # RMS
            float(x.min()) if n else 0.0,
            float(x.max()) if n else 0.0,
            zc,  # zero-crossing rate
            dom_hz,  # dominant-frequency (argmax |rfft|, DC excluded)
            centroid_hz,  # spectral centroid
        ]
    )
    return np.pad(v, (0, max(0, dim - len(v))))[:dim]


def _real_features(payload: bytes, kind: str, fmt: str, dim: int) -> list:
    """Dispatch to a REAL pure-Python decoder by declared format."""
    if payload is None:
        return np.zeros(dim).tolist()
    if fmt == "ppm":
        return _image_features(_decode_ppm(payload), dim).tolist()
    if fmt == "bmp":
        return _image_features(_decode_bmp(payload), dim).tolist()
    if fmt == "png":
        return _image_features(_decode_png(payload), dim).tolist()
    if fmt in ("jpeg", "jpg"):
        return _image_features(_decode_jpeg(payload), dim).tolist()
    if fmt == "wav":
        x, rate = _decode_wav(payload)
        return _audio_features(x, rate, dim).tolist()
    raise NotImplementedError(
        f"no in-container decoder for format {fmt!r} (kind {kind!r}); "
        "ppm/bmp/png/jpeg/wav decode natively — other codecs plug in here"
    )


def extract_features(
    media: DataFrame, decoder: str = "stub", dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract each asset via Arrow-batched mapInPandas.

    ``decoder='real'`` decodes natively-supported containers — PPM/BMP/
    PNG images (PNG via stdlib ``zlib`` inflate + defilter), baseline
    sequential JPEG (pure-numpy Huffman + IDCT per ITU-T T.81) and
    WAV/PCM audio (stdlib ``wave``) — into per-asset stat
    vectors; unsupported formats raise ``NotImplementedError`` naming
    the plug-in point. ``'stub'`` marks that integration point
    unconditionally; ``'fake'`` produces deterministic md5-seeded
    vectors so the plumbing (batching, schema, ordering) is testable
    independent of any codec.
    """
    if decoder not in ("stub", "fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; plug the decoder in here"
                )
            if decoder == "real":
                fmts = [
                    (m or {}).get("format") for m in pdf["meta"]
                ]
                feats = [
                    _real_features(c, k, f, dim)
                    for c, k, f in zip(pdf["content"], pdf["kind"], fmts)
                ]
            else:
                feats = [
                    _fake_features(c, dim).tolist() for c in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return _parallelize_scan(media).mapInPandas(run, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for videos: explode frame indices 0, n, 2n…
    from metadata JVM-side (no payload decode; the per-frame payload
    slice happens in the decode stage)."""
    # n_frames >= 1 required: greatest(n_frames-1, 0) would emit a
    # phantom frame_idx=0 row for an empty/corrupt video (n_frames=0
    # or NULL), and the downstream decode stage would index a frame
    # that does not exist
    return media.filter(
        (F.col("kind") == "video") & (F.col("meta.n_frames") >= 1)
    ).select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta.n_frames") - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_plan(
    media: DataFrame, max_width: int = 32
) -> DataFrame:
    """Metadata-level resize planning: target dims computed JVM-side;
    payload transformation deferred to the decode stage (stub)."""
    scale = F.when(
        F.col("meta.width") > max_width,
        F.lit(max_width) / F.col("meta.width").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.withColumn(
        "target",
        F.struct(
            F.round(F.col("meta.width") * scale).cast("int").alias("width"),
            F.round(F.col("meta.height") * scale).cast("int").alias("height"),
        ),
    )


# ------------------------------------------------- perceptual hashes

def _luma(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (h, w) float64 Rec.601 luma."""
    f = px.astype(np.float64)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def _block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-mean downscale to (out_h, out_w): cell (i, j)
    averages the index-floor block [i*h//out_h, (i+1)*h//out_h) — no
    interpolation library, identical on every platform. Images smaller
    than the target in a dimension degrade to nearest-index sampling
    (the clamp keeps every block non-empty)."""
    h, w = img.shape
    # the FINAL boundary is exactly h/w so the last pixel row/column
    # is always averaged in; intermediate starts for h < out_h repeat
    # and the max(...) guard below keeps every block non-empty (its
    # end then stays <= h because i*h//out_h <= h-1 for i < out_h)
    rb = [i * h // out_h for i in range(out_h + 1)]
    cb = [j * w // out_w for j in range(out_w + 1)]
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        r0, r1 = rb[i], max(rb[i + 1], rb[i] + 1)
        for j in range(out_w):
            c0, c1 = cb[j], max(cb[j + 1], cb[j] + 1)
            out[i, j] = img[r0:r1, c0:c1].mean()
    return out


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major MSB-first bit pack into a SIGNED 64-bit value (the
    Spark LongType domain; bit 63 set wraps negative)."""
    v = 0
    for bit in bits.ravel():
        v = (v << 1) | int(bit)
    n = bits.size
    if n == 64 and v >= 1 << 63:
        v -= 1 << 64
    return v


def _dhash64(px: np.ndarray, hash_size: int = 8) -> int:
    """Difference hash: luma -> (hash_size, hash_size+1) area-mean,
    bit = right neighbour brighter than left (the imagehash
    convention), row-major MSB-first."""
    g = _block_mean(_luma(px), hash_size, hash_size + 1)
    return _pack_bits(g[:, 1:] > g[:, :-1])


def _ahash64(px: np.ndarray, hash_size: int = 8) -> int:
    """Average hash: luma -> (hash_size, hash_size) area-mean, bit =
    cell above the global mean."""
    g = _block_mean(_luma(px), hash_size, hash_size)
    return _pack_bits(g > g.mean())


_PHASH_SCHEMA = "media_id long, dhash long, ahash long"

_IMAGE_DECODERS = {
    "ppm": _decode_ppm,
    "bmp": _decode_bmp,
    "png": _decode_png,
    "jpeg": _decode_jpeg,
    "jpg": _decode_jpeg,
}


def perceptual_hashes(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Per-image dHash + aHash via Arrow-batched ``mapInPandas`` over
    the in-container decoders (PPM/BMP/PNG/baseline JPEG). NULL payloads and
    non-image rows emit NULL hashes (pass-through, excluded from any
    downstream banding); undecodable declared formats raise the same
    explicit ``NotImplementedError`` boundary as
    :func:`extract_features`.

    Scale: decode cost is the scan; hashes are 16 bytes/row. The
    downstream near-dup join never touches pixels again."""
    if hash_size * hash_size > 64:
        raise ValueError(
            f"hash_size={hash_size} yields {hash_size * hash_size} bits;"
            " the packed hash and the hamming banding domain are 64-bit"
            " LongType — hash_size must satisfy hash_size**2 <= 64"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            d_out, a_out = [], []
            for content, kind, meta in zip(
                pdf["content"], pdf["kind"], pdf["meta"]
            ):
                fmt = (meta or {}).get("format")
                if content is None or kind != "image":
                    d_out.append(None)
                    a_out.append(None)
                    continue
                dec = _IMAGE_DECODERS.get(fmt)
                if dec is None:
                    raise NotImplementedError(
                        f"no in-container decoder for image format {fmt!r};"
                        " ppm/bmp/png/jpeg decode natively — other codecs plug"
                        " in here"
                    )
                px = dec(bytes(content))
                d_out.append(_dhash64(px, hash_size))
                a_out.append(_ahash64(px, hash_size))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.array(d_out, dtype="Int64"),
                    "ahash": pd.array(a_out, dtype="Int64"),
                }
            )

    return _parallelize_scan(media).mapInPandas(run, schema=_PHASH_SCHEMA)


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    hash_size: int = 8,
) -> DataFrame:
    """Image near-duplicate pairs: dHash each image once
    (:func:`perceptual_hashes`), then reuse the generic hamming-LSH
    banding (``operators/dedup.py::hamming_near_dup_pairs``) — band
    collisions propose, exact popcount verifies. Output
    ``(doc_a, doc_b, hamming)`` over media ids.

    Defaults keep the stage COMPLETE (``max_hamming < bands`` — every
    pair within distance 3 is found) and cheap (16-bit bands collide
    at 2^-16 per table for unrelated images). The pixel decode happens
    exactly once per image; the pair stage is integer-only."""
    from .dedup import hamming_near_dup_pairs

    hashes = perceptual_hashes(media, hash_size)
    return hamming_near_dup_pairs(
        hashes,
        id_col="media_id",
        hash_col="dhash",
        max_hamming=max_hamming,
        bands=bands,
        n_bits=hash_size * hash_size,
    )


_AFP_SCHEMA = "media_id long, afp long"


def audio_fingerprint(
    media: DataFrame, n_bits: int = 64, content_col: str = "content"
) -> DataFrame:
    """Per-clip audio fingerprint via Arrow-batched ``mapInPandas``
    over the in-container WAV decoder: split the clip into
    ``n_bits + 1`` equal sample windows and set bit ``n_bits-1-k``
    (MSB-first, the dHash packing) iff window ``k+1`` holds more
    energy than window ``k`` — the sign-of-energy-delta family every
    published audio fingerprint builds on (Haitsma & Kalker 2002's
    band-energy deltas, reduced to time-domain windows so the whole
    pipeline stays numpy + stdlib ``wave``; a spectral variant plugs
    in at the energy vector).

    Determinism, stated precisely: 16-bit PCM samples normalize to
    exact dyadic doubles (i/2^15), their squares and window sums stay
    exactly representable (each term is a multiple of 2^-30 well
    under the 53-bit mantissa), so the energy COMPARISON is an
    integer comparison in disguise — bit-stable across hosts.

    NULL payloads / non-audio rows emit NULL fingerprints
    (pass-through, excluded from any downstream banding, the
    :func:`perceptual_hashes` rule); clips shorter than ``n_bits + 1``
    samples have no defined delta sequence and also emit NULL.
    Scale: decode cost is the scan; the fingerprint is 8 bytes/row
    and the near-dup join never touches samples again."""
    if not 1 <= n_bits <= 64:
        raise ValueError(f"n_bits must be in [1, 64], got {n_bits}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content, kind in zip(pdf[content_col], pdf["kind"]):
                if content is None or kind != "audio":
                    out.append(None)
                    continue
                x, _rate = _decode_wav(bytes(content))
                w = len(x) // (n_bits + 1)
                if w == 0:
                    out.append(None)
                    continue
                trimmed = x[: w * (n_bits + 1)]
                energy = (trimmed * trimmed).reshape(n_bits + 1, w).sum(
                    axis=1
                )
                out.append(
                    _pack_bits(energy[1:] > energy[:-1])
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": pd.array(out, dtype="Int64"),
                }
            )

    return _parallelize_scan(media).mapInPandas(run, schema=_AFP_SCHEMA)


def audio_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    n_bits: int = 64,
) -> DataFrame:
    """Audio near-duplicate pairs: fingerprint each clip once
    (:func:`audio_fingerprint`), then reuse the generic hamming-LSH
    banding (``operators/dedup.py::hamming_near_dup_pairs``) — the
    audio member of the perceptual near-dup family, byte-for-byte the
    :func:`image_near_dup_pairs` shape over a different decoder.
    Output ``(doc_a, doc_b, hamming)`` over media ids; defaults keep
    the stage pigeonhole-complete (``max_hamming < bands``). Samples
    decode exactly once; the pair stage is integer-only."""
    from .dedup import hamming_near_dup_pairs

    fps = audio_fingerprint(media, n_bits)
    return hamming_near_dup_pairs(
        fps,
        id_col="media_id",
        hash_col="afp",
        max_hamming=max_hamming,
        bands=bands,
        n_bits=n_bits,
    )


# ------------------------------------------------------------- video


def _decode_y4m(data: bytes) -> list:
    """YUV4MPEG2 container -> list of (h, w, 3) uint8 frames (the LUMA
    plane stacked to three channels — Rec.601 of (y, y, y) is a
    constant scale of y, so every downstream luma COMPARISON, which is
    all the perceptual hashes consume, is exact). Pure byte walking,
    no codec library: the stream is 'YUV4MPEG2 <params>\\n' then per
    frame 'FRAME[ params]\\n' + raw planes. Colourspaces whose Y plane
    is the first h*w bytes decode natively (Cmono / C420* / C444 —
    chroma is skipped by size); anything else raises the explicit
    plug-in boundary."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    cspace = "420"  # the Y4M default when C is absent
    for tok in data[:nl].split(b" ")[1:]:
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            cspace = tok[1:].decode("ascii", "replace")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cspace == "mono":
        frame_len = w * h
    elif cspace.startswith("420"):
        frame_len = w * h + 2 * ((w // 2) * (h // 2))
    elif cspace == "444":
        frame_len = 3 * w * h
    else:
        raise NotImplementedError(
            f"Y4M colourspace C{cspace} unsupported; mono/420/444 decode"
            " natively — other samplings plug in here"
        )
    frames, pos = [], nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("corrupt Y4M frame marker")
        body = data[fnl + 1 : fnl + 1 + frame_len]
        if len(body) < frame_len:
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(body[: w * h], dtype=np.uint8).reshape(h, w)
        frames.append(np.repeat(y[:, :, None], 3, axis=2))
        pos = fnl + 1 + frame_len
    return frames


def _split_mjpeg(data: bytes) -> list:
    """Raw MJPEG stream (concatenated JPEG images, the ffmpeg
    '.mjpeg' byte format) -> list of per-frame JPEG byte strings.
    Walks SOI (FFD8) .. EOI (FFD9) pairs; scan payloads are entropy-
    stuffed (FF is always followed by 00 or a marker), so the naive
    EOI scan is exact for baseline streams."""
    frames, pos = [], 0
    while True:
        soi = data.find(b"\xff\xd8", pos)
        if soi < 0:
            break
        eoi = data.find(b"\xff\xd9", soi + 2)
        if eoi < 0:
            raise ValueError("MJPEG frame missing EOI")
        frames.append(data[soi : eoi + 2])
        pos = eoi + 2
    if not frames:
        raise ValueError("no JPEG frames in MJPEG payload")
    return frames


def _video_frames(data: bytes, fmt: str) -> list:
    """Container walk -> list of pixel-array frames, reusing the
    in-container image decoders (SURVEY §7: the video member completes
    the image/audio perceptual family). y4m and raw mjpeg decode
    natively; compressed containers raise the explicit boundary."""
    if fmt == "y4m":
        return _decode_y4m(data)
    if fmt in ("mjpeg", "mjpg"):
        return [_decode_jpeg(seg) for seg in _split_mjpeg(data)]
    raise NotImplementedError(
        f"no in-container walker for video format {fmt!r}; y4m/mjpeg"
        " decode natively — H.264/VP9/AV1 etc. plug in here"
    )


_VFRAME_SCHEMA = "media_id long, frame_idx int, fhash long"


def video_frame_hashes(
    media: DataFrame, every_n: int = 1, hash_size: int = 8
) -> DataFrame:
    """Per-sampled-frame dHash via Arrow-batched ``mapInPandas``: walk
    the container, keep frames 0, n, 2n, …, dHash each — one
    ``(media_id, frame_idx, fhash)`` row per sampled frame. The
    frame-index sampling happens INSIDE the walk (containers are
    sequential byte streams; unlike ``sample_frames``' metadata plan
    there is no random access to skip decode I/O, but non-sampled
    frames skip the hash work). NULL payloads / non-video rows emit
    nothing."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for mid, content, kind, meta in zip(
                pdf["media_id"], pdf["content"], pdf["kind"], pdf["meta"]
            ):
                if content is None or kind != "video":
                    continue
                fmt = (meta or {}).get("format")
                for k, px in enumerate(_video_frames(bytes(content), fmt)):
                    if k % every_n:
                        continue
                    ids.append(mid)
                    idxs.append(k)
                    hs.append(_dhash64(px, hash_size))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "fhash": pd.array(hs, dtype="Int64"),
                }
            )

    return _parallelize_scan(media).mapInPandas(run, schema=_VFRAME_SCHEMA)


_VFP_SCHEMA = "media_id long, vfp long, n_frames_hashed int"


def video_fingerprint(
    media: DataFrame, every_n: int = 1, hash_size: int = 8
) -> DataFrame:
    """Fixed-length video fingerprint: bitwise MAJORITY fold of the
    sampled frames' dHashes — bit j of ``vfp`` is set iff more than
    half the sampled frames set bit j (ties → 0). The fold keeps the
    fingerprint 8 bytes regardless of duration, is invariant to frame
    REORDERING and robust to a minority of edited/inserted frames —
    the properties a near-dup key needs (a re-encoded or lightly
    trimmed copy majority-votes to the same bits), at the cost of
    temporal structure (two videos with the same shots shuffled
    collide — for near-DUP detection that is a feature). NULL
    payloads / non-video / zero-frame rows emit NULL (the
    ``perceptual_hashes`` pass-through rule).

    Scale: the container decode is the scan; the fold is per-row
    Python ints; pairs (``video_near_dup_pairs``) never touch frames
    again."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    n_bits = hash_size * hash_size
    if n_bits > 64:
        raise ValueError("hash_size**2 must be <= 64 (LongType domain)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, nf = [], []
            for content, kind, meta in zip(
                pdf["content"], pdf["kind"], pdf["meta"]
            ):
                if content is None or kind != "video":
                    out.append(None)
                    nf.append(None)
                    continue
                fmt = (meta or {}).get("format")
                hashes = [
                    _dhash64(px, hash_size)
                    for k, px in enumerate(_video_frames(bytes(content), fmt))
                    if k % every_n == 0
                ]
                if not hashes:
                    out.append(None)
                    nf.append(0)
                    continue
                votes = [0] * n_bits
                for hv in hashes:
                    u = hv & ((1 << 64) - 1)  # two's-complement view
                    for j in range(n_bits):
                        votes[j] += (u >> j) & 1
                v = 0
                half = len(hashes) / 2.0
                for j in range(n_bits):
                    if votes[j] > half:
                        v |= 1 << j
                if v >= 1 << 63:
                    v -= 1 << 64
                out.append(v)
                nf.append(len(hashes))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "vfp": pd.array(out, dtype="Int64"),
                    "n_frames_hashed": pd.array(nf, dtype="Int32"),
                }
            )

    return media.mapInPandas(run, schema=_VFP_SCHEMA)


def video_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    every_n: int = 1,
    hash_size: int = 8,
) -> DataFrame:
    """Video near-duplicate pairs: fingerprint each video once
    (:func:`video_fingerprint` — container walk → per-frame dHash →
    majority fold), then the generic hamming-LSH banding
    (``operators/dedup.py::hamming_near_dup_pairs``) — the video
    member of the perceptual family, byte-for-byte the
    :func:`image_near_dup_pairs` / :func:`audio_near_dup_pairs` shape.
    Output ``(doc_a, doc_b, hamming)``; defaults keep the stage
    pigeonhole-complete (``max_hamming < bands``). Frames decode
    exactly once; the pair stage is integer-only."""
    from .dedup import hamming_near_dup_pairs

    fps = video_fingerprint(media, every_n=every_n, hash_size=hash_size)
    return hamming_near_dup_pairs(
        fps.select("media_id", "vfp"),
        id_col="media_id",
        hash_col="vfp",
        max_hamming=max_hamming,
        bands=bands,
        n_bits=hash_size * hash_size,
    )
