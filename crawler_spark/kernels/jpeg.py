"""Baseline JFIF (JPEG) codec — stdlib + numpy, no image library.

The reference crawler stores fetched media as opaque blobs and relies on
external tooling to decode them (`crawler/services/storage.py:56-71`); a web
corpus is overwhelmingly JPEG, so the Spark-side pipeline needs a real
decode path for it. This module implements the baseline sequential DCT
process from the public ITU-T T.81 / JFIF specs:

  decode: marker walk (SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI), canonical
  Huffman decode (the spec's mincode/maxcode/valptr algorithm), byte
  unstuffing + restart-marker handling, dequantization, de-zigzag, exact
  float 2-D IDCT (orthonormal matrix form, vectorized over all blocks),
  level shift, chroma upsampling by replication (1x1..2x2 sampling
  factors), JFIF YCbCr->RGB.

  encode: grayscale or 4:4:4 colour, forward DCT + quantization + zigzag +
  DC-diff / AC run-length coding with SELF-GENERATED canonical Huffman
  tables (all 12 DC size symbols at 4 bits, the 162 baseline AC symbols at
  8 bits — valid, simple, and carried in the stream's own DHT segments, so
  the decoder exercises real table parsing, not a shared constant).

Hardening (same contract as the PNG/GIF codecs): every segment length is
bounds-checked against the payload, dimensions are capped by
``max_pixels`` BEFORE any plane allocation (the IHDR-style lying-header
attack), progressive/arithmetic/12-bit streams raise ValueError, and a
truncated entropy stream raises instead of looping.

Quantization is the ONLY lossy step: with an all-ones table the round-trip
error is bounded by coefficient rounding (~2 grey levels), and a
constant-valued 8x8 block round-trips EXACTLY at any quality (its DCT has
one integer coefficient 8*(v-128)) — which is what makes the decode
SQL-oracle-able without a reference decoder in the container.
"""

from __future__ import annotations

import struct

import numpy as np

# Tighter than multimodal.MAX_DECODE_PIXELS (1<<26): this decoder's working
# set is several float64 planes plus per-block coefficient arrays built in
# Python loops, so a ceiling-sized baseline JPEG costs GBs of transient
# allocations and minutes of scan decode — 16 Mpixel (~4096x4096, larger
# than any sane crawled photo) bounds both memory and CPU per image.
MAX_PIXELS_DEFAULT = 1 << 24

# zigzag scan order: ZIGZAG[k] = flat (row-major) index of the k-th
# coefficient in scan order (T.81 Figure A.6, derived procedurally — walk
# anti-diagonals alternating direction)


def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT matrix: C @ C.T == I; forward F = C f C^T,
# inverse f = C^T F C. DC scaling matches T.81 (constant block c -> F00=8c).
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0, :] = np.sqrt(1.0 / 8.0)

Q_ONES = np.ones(64, dtype=np.int64)  # near-lossless default table


# --------------------------------------------------------------- huffman

# self-generated canonical tables (see module docstring): DC sizes 0..11
# all at 4 bits; AC = EOB, ZRL and every (run 0..15, size 1..10) at 8 bits
DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """mincode/maxcode/valptr decode tables (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        if k != len(vals):
            raise ValueError("DHT counts do not match value bytes")


class _BitReader:
    """MSB-first reader over UNSTUFFED entropy bytes; EOF raises."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[length]:
                return table.vals[table.valptr[length] + code - table.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw `size`-bit value to its signed
    coefficient (low half of the range encodes negatives)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _mag_bits(v: int) -> tuple[int, int]:
    """coefficient -> (size, raw bits) for the DC/AC magnitude encoding."""
    size = int(abs(v)).bit_length()
    raw = v if v >= 0 else v + (1 << size) - 1
    return size, raw


def _encode_blocks(
    planes: list[np.ndarray],
    qtables: list[np.ndarray],
    per_mcu: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Interleaved scan: ``per_mcu[ci]`` 8x8 blocks per component per MCU
    (all 1 for grayscale / 4:4:4; Y carries 4 under 4:2:0). ``planes[ci]``
    holds that component's blocks in MCU-major, within-MCU raster order.
    ``restart_interval`` > 0 emits an RSTn marker (and resets the DC
    predictors + bit alignment) every that-many MCUs, per T.81 E.2.4."""
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    per_mcu = per_mcu or [1] * len(planes)
    n_mcus = planes[0].shape[0] // per_mcu[0]
    w = _BitWriter()
    pred = [0] * len(planes)
    chunks: list[bytes] = []
    seq = [
        (m, ci, m * per_mcu[ci] + j)
        for m in range(n_mcus)
        for ci in range(len(planes))
        for j in range(per_mcu[ci])
    ]
    for m, ci, bi in seq:
        if restart_interval and m and m % restart_interval == 0 and ci == 0 \
                and bi == m * per_mcu[0]:
            interval = m // restart_interval - 1
            chunks.append(w.flush())
            chunks.append(bytes([0xFF, 0xD0 + interval % 8]))
            w = _BitWriter()
            pred = [0] * len(planes)
        block = planes[ci][bi].astype(np.float64) - 128.0
        coef = DCT_M @ block @ DCT_M.T
        q = np.round(coef.reshape(64) / qtables[ci]).astype(np.int64)
        zz = q[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, raw = _mag_bits(diff)
        code, length = dc_codes[size]
        w.write(code, length)
        if size:
            w.write(raw, size)
        run = 0
        last_nz = np.flatnonzero(zz[1:])
        end = (last_nz[-1] + 2) if len(last_nz) else 1
        for k in range(1, end):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_codes[0xF0]
                w.write(code, length)
                run -= 16
            size, raw = _mag_bits(v)
            if size > 10:
                raise ValueError("AC coefficient overflows 10-bit table")
            code, length = ac_codes[(run << 4) | size]
            w.write(code, length)
            w.write(raw, size)
            run = 0
        if end < 64:
            code, length = ac_codes[0x00]
            w.write(code, length)
    chunks.append(w.flush())
    return b"".join(chunks)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _pad_blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-replicate to 8-multiples, return (n_blocks, 8, 8) row-major."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    return (
        p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % mult), (0, -w % mult)), mode="edge")


def _blocks_mcu_order(plane: np.ndarray, factor: int) -> np.ndarray:
    """Blocks in MCU-major order with a `factor` x `factor` sub-block raster
    per MCU (factor=1 degenerates to plain raster order)."""
    p = _pad_to(plane, 8 * factor)
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)  # (bh, bw, 8, 8)
    if factor == 1:
        return blocks.reshape(bh * bw, 8, 8)
    mh, mw = bh // factor, bw // factor
    return (
        blocks.reshape(mh, factor, mw, factor, 8, 8)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(mh * mw * factor * factor, 8, 8)
    )


def encode_jpeg(
    pixels: np.ndarray,
    qtable: np.ndarray | list[int] | None = None,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB -> baseline JFIF bytes.
    Colour is encoded 4:4:4 by default; ``subsample="420"`` downsamples
    chroma 2x2 (box mean) with 2x2-sampled luma — the dominant wild-JPEG
    layout, exercising the decoder's multi-block MCU walk and replication
    upsampling. ``qtable`` is a 64-entry natural-order quantization table
    (default all-ones, near-lossless)."""
    q = np.asarray(qtable if qtable is not None else Q_ONES, dtype=np.int64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("qtable must be 64 entries in 1..255")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if pixels.ndim == 2:
        comps = [pixels.astype(np.float64)]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        r = pixels[..., 0].astype(np.float64)
        g = pixels[..., 1].astype(np.float64)
        b = pixels[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [y, cb, cr]
    else:
        raise ValueError("pixels must be (h, w) gray or (h, w, 3) RGB")
    h, w = pixels.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError("dimensions must fit u16")
    planes = [np.clip(np.round(c), 0, 255) for c in comps]
    if subsample == "420" and len(planes) == 3:
        yp = _pad_to(planes[0], 16)
        sub = [
            p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))
            for p in (_pad_to(planes[1], 16), _pad_to(planes[2], 16))
        ]
        blocks = [
            _blocks_mcu_order(yp, 2),
            _blocks_mcu_order(np.round(sub[0]), 1),
            _blocks_mcu_order(np.round(sub[1]), 1),
        ]
        per_mcu = [4, 1, 1]
        samplings = [0x22, 0x11, 0x11]
    else:
        blocks = [_pad_blocks(p) for p in planes]
        per_mcu = [1] * len(planes)
        samplings = [0x11] * len(planes)
    data = _encode_blocks(blocks, [q] * len(blocks), per_mcu, restart_interval)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q[ZIGZAG]))
    nf = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        sof += bytes([ci + 1, samplings[ci], 0])  # sampling, qtable 0
    out += _seg(0xC0, sof)
    out += _seg(
        0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    )
    out += _seg(
        0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


def _unstuff_scan(payload: bytes, start: int) -> tuple[bytes, int]:
    """Entropy bytes from `start` with FF00 unstuffed; RST markers are
    passed through as sentinel positions (handled by the caller via the
    returned marker list). Returns (clean_bytes_with_rst_removed, pos of
    the terminating marker's 0xFF)."""
    out = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated scan (dangling 0xFF)")
        nxt = payload[i + 1]
        if nxt == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            # restart marker: byte-aligned DC reset. We re-encode it as an
            # in-band sentinel the bit reader can never produce (it operates
            # on unstuffed bytes only), by splitting segments instead.
            raise _RestartMarker(bytes(out), i + 2)
        else:
            return bytes(out), i
    raise ValueError("scan ran past end of payload without a marker")


class _RestartMarker(Exception):
    def __init__(self, segment: bytes, resume: int):
        self.segment = segment
        self.resume = resume


def _collect_scan(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Split the entropy stream into restart intervals (1 element when no
    RST markers appear)."""
    segments = []
    pos = start
    while True:
        try:
            seg, end = _unstuff_scan(payload, pos)
        except _RestartMarker as rm:
            segments.append(rm.segment)
            pos = rm.resume
            continue
        segments.append(seg)
        return segments, end


def decode_jpeg_bytes(
    payload: bytes, max_pixels: int = MAX_PIXELS_DEFAULT
):
    """Baseline JFIF parse -> (width, height, n_components, pixel array).
    Pixels are (h, w) uint8 for grayscale streams, (h, w, 3) uint8 RGB for
    colour (JFIF YCbCr, sampling factors 1-2 upsampled by replication).
    Raises ValueError on anything outside baseline sequential (progressive,
    arithmetic coding, 12-bit precision, >4 components) and on hostile
    input (lying segment lengths, dimension bombs, truncated scans)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {payload[pos]:#x}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("EOI before any scan data")
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        if length < 2 or pos + 2 + length > n:
            raise ValueError("segment length exceeds payload (truncated JPEG?)")
        body = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                zz = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz  # stored in zigzag order, spec B.2.4.1
                qtables[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                if i + 17 > len(body):
                    raise ValueError("truncated DHT")
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                if i + 17 + nv > len(body):
                    raise ValueError("truncated DHT values")
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended seq.
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nf < 1 or nf > 4:
                raise ValueError(f"unsupported component count {nf}")
            if w <= 0 or h <= 0 or w * h > max_pixels:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} exceed the "
                    f"{max_pixels}-pixel decode ceiling"
                )
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(f"sampling factors {hs}x{vs} unsupported")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cs, tdta = body[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            segments, end = _collect_scan(payload, pos)
            return _decode_scan(
                frame, scan_comps, qtables, huff, segments,
                restart_interval,
            )
        # APPn / COM / anything else with a length: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan_comps, qtables, huff, segments, restart_interval):
    h, w, comps = frame
    if len(scan_comps) != len(comps):
        raise ValueError("partial (multi-scan) images unsupported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    by_id = {c[0]: c for c in comps}
    order = []
    planes = []
    tables = []
    for cs, td, ta in scan_comps:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        cid, hs, vs, tq = by_id[cs]
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("scan references missing Huffman table")
        planes.append(
            np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        )
        tables.append((huff[(0, td)], huff[(1, ta)], qtables[tq]))
        order.append((hs, vs))
    n_mcus = mcus_x * mcus_y
    # restart intervals partition the MCU sequence; without DRI there is
    # exactly one segment covering every MCU
    if restart_interval:
        expect_segments = -(-n_mcus // restart_interval)
        if len(segments) != expect_segments:
            raise ValueError("restart-marker count does not match DRI")
    elif len(segments) != 1:
        raise ValueError("restart markers present without a DRI segment")

    blocks_per_mcu = sum(hs * vs for hs, vs in order)
    coef = [[] for _ in order]  # per component: list of (n_blocks, 8, 8)
    seg_idx = -1
    reader = None
    pred = [0] * len(order)
    for m in range(n_mcus):
        if restart_interval and m % restart_interval == 0 or reader is None:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = [0] * len(order)
        for ci, (hs, vs) in enumerate(order):
            dc_t, ac_t, q = tables[ci]
            for _ in range(hs * vs):
                zz = np.zeros(64, dtype=np.int64)
                size = reader.decode_symbol(dc_t)
                if size > 11:
                    raise ValueError("DC size out of range")
                pred[ci] += _extend(reader.read_bits(size), size)
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(ac_t)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = rs >> 4, rs & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(reader.read_bits(size), size)
                    k += 1
                # zz holds SCAN-order coefficients; q is NATURAL-order —
                # dequantize with the table permuted into scan order
                # (multiplying by q directly only cancels out for uniform
                # tables, which is exactly what hid this in round-trips)
                coef[ci].append(zz * q[ZIGZAG])
    for ci, (hs, vs) in enumerate(order):
        blocks = np.array(coef[ci], dtype=np.float64)[:, UNZIGZAG].reshape(
            -1, 8, 8
        )
        spatial = np.einsum(
            "ij,njk,kl->nil", DCT_M.T, blocks, DCT_M
        ) + 128.0
        # place blocks: MCU-major, then vs x hs within the MCU
        plane = planes[ci]
        bi = 0
        for m in range(n_mcus):
            my, mx = divmod(m, mcus_x)
            for byy in range(vs):
                for bxx in range(hs):
                    y0 = (my * vs + byy) * 8
                    x0 = (mx * hs + bxx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[bi]
                    bi += 1
        # upsample to full resolution by replication, crop
        planes[ci] = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )[:h, :w]
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
