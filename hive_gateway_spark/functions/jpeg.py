"""Baseline-sequential JPEG codec — pure stdlib + numpy (ITU-T T.81).

Closes the one multimodal format gap the decode family had (VERDICT
r04 #6 / r05 #8): `jpeg_decode` parses the marker stream (SOI/DQT/
SOF0/DHT/DRI/SOS), huffman-decodes the interleaved MCU entropy stream
(with byte unstuffing and restart-marker handling), dequantizes,
inverse-DCTs each 8×8 block, reassembles the component planes with
sampling-factor upsampling (4:4:4 / 4:2:2 / 4:2:0), and converts
JFIF YCbCr→RGB. Quant/huffman tables are read from the FILE (DQT/DHT),
never assumed, so any spec-conformant baseline JPEG decodes.

Out of scope — explicit NotImplementedError, routed by DECODE_ERRORS
exactly like palette-PNG: progressive (SOF2), arithmetic coding
(SOF9+), 12-bit precision, DNL. A production cluster swaps this kernel
for libjpeg-turbo behind the same `decode_image` signature; the pure
Python bit loop is the correctness baseline the fixture tests pin.

`jpeg_encode` is the test-support twin (4:4:4 or 4:2:0, fixed Annex-K
style tables embedded in the output): tests round-trip random images
through encode→decode and bound the reconstruction error, and a
DC-only (solid color) image must reconstruct exactly.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_decode", "jpeg_encode"]


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

def _zigzag() -> np.ndarray:
    """The 64-entry zigzag scan order, generated (not transcribed)."""
    order = sorted(
        ((y, x) for y in range(8) for x in range(8)),
        key=lambda p: (p[0] + p[1], p[1] if (p[0] + p[1]) % 2 else p[0]),
    )
    return np.array([y * 8 + x for y, x in order], dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

#: Orthonormal 8-point DCT-II basis: forward X = T @ x @ T.T, inverse
#: x = T.T @ X @ T.
_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _T.T @ block @ _T


def _dct2(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


class _HuffTable:
    """Canonical huffman table from the DHT (bits[16], values) form."""

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
        # encode direction: symbol -> (code, length)
        self.codes = {v: (c, l) for (l, c), v in self.lookup.items()}


def _extend(raw: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: raw `size`-bit magnitude → signed value."""
    if size == 0:
        return 0
    if raw < (1 << (size - 1)):
        return raw - (1 << size) + 1
    return raw


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers surface via `at_restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed literal 0xFF
            else:
                # a real marker: rewind so the scan loop sees it
                self.pos -= 1
                self.marker = nxt
                raise ValueError("hit marker inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    def sync_restart(self) -> None:
        """Byte-align, consume an RSTn marker, reset the bit buffer."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def jpeg_decode(payload: bytes) -> dict:
    """Baseline JPEG → {"width", "height", "channels", "pixels"}.

    pixels: HxWx3 uint8 RGB (3-component YCbCr) or HxWx1 (grayscale).
    Raises NotImplementedError for progressive/arithmetic/12-bit, and
    ValueError for malformed streams — both in DECODE_ERRORS, so a bad
    asset routes its row instead of failing the Spark task.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    dri = 0
    frame = None  # (w, h, comps) where comps = [(cid, h, v, tq)]
    scan = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg, np.uint8, 64, i).astype(np.float64)
                    i += 64
                else:
                    tab = np.frombuffer(seg, ">u2", 64, i).astype(np.float64)
                    i += 128
                qt[tq] = tab  # zigzag order
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) supported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF) for i in range(ns)]
            pos += seglen
            break
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    w, h, comps = frame
    if w == 0 or h == 0:
        raise NotImplementedError("DNL-deferred dimensions not supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    by_id = {c[0]: c for c in comps}
    planes = {}
    order = []
    for cid, td, ta in scan:
        _, ch, cv, tq = by_id[cid]
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        order.append((cid, ch, cv, tq, td, ta))

    reader = _BitReader(payload, pos)
    pred = {cid: 0 for cid, *_ in order}
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            reader.sync_restart()
            pred = {cid: 0 for cid, *_ in order}
        my, mx = divmod(m, mcux)
        for cid, ch, cv, tq, td, ta in order:
            for by in range(cv):
                for bx in range(ch):
                    zz = np.zeros(64, dtype=np.float64)
                    s = reader.decode(huff_dc[td])
                    diff = _extend(reader.bits(s), s) if s else 0
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.decode(huff_ac[ta])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: skip 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.bits(s), s)
                        k += 1
                    block = _idct2((zz * qt[tq])[UNZIGZAG].reshape(8, 8))
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block

    out = []
    for cid, ch, cv, tq, td, ta in order:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        pix = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[..., None]
        return {"width": w, "height": h, "channels": 1, "pixels": pix}
    if len(out) != 3:
        raise NotImplementedError(f"{len(out)}-component JPEG not supported")
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    pix = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": pix}


# --------------------------------------------------------------------------
# encoder (test support)
# --------------------------------------------------------------------------

#: Quality-50 base quant tables (Annex K style values; the exact
#: constants only shape the loss — the decoder always reads tables
#: from the file).
_QL = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.float64,
)
_QC = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.float64,
)

def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Build a valid canonical table: all symbols at (near-)uniform code
    lengths. n symbols need length L with 2^L > n (strictly, to keep
    the all-ones code unused per JPEG convention)."""
    L = 1
    while (1 << L) <= len(symbols):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, symbols


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _encode_block(
    wtr: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    pred: int,
    dc: _HuffTable,
    ac: _HuffTable,
) -> int:
    coef = _dct2(block - 128.0).reshape(64)[ZIGZAG]
    q = np.round(coef / qtab).astype(np.int64)
    diff = int(q[0]) - pred
    s = int(abs(diff)).bit_length()
    code, length = dc.codes[s]
    wtr.write(code, length)
    if s:
        wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(q[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac.codes[0xF0]
            wtr.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac.codes[(run << 4) | s]
        wtr.write(code, length)
        wtr.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac.codes[0x00]
        wtr.write(code, length)
    return int(q[0])


def jpeg_encode(pixels: np.ndarray, quality: int = 85, subsample: str = "444") -> bytes:
    """HxWx3 uint8 RGB (or HxW / HxWx1 grayscale) → baseline JFIF JPEG.

    subsample: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + box-averaged chroma per MCU)."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2 or pixels.shape[2] == 1
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels[..., 0]]
        samp = [(1, 1)]
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            # pad to even then 2x2 box-average the chroma
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unknown subsample {subsample!r}")
        planes = [y, cb, cr]

    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    qtabs = [ql] + ([qc, qc] if not gray else [])
    dc_tab = _HuffTable(*_flat_table(list(range(12))))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 12)
    ]
    ac_tab = _HuffTable(*_flat_table(ac_syms))

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"))

    out = bytearray(b"\xff\xd8")
    # APP0 JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tab in enumerate([ql] if gray else [ql, qc]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in tab
        )
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, tab in ((0, dc_tab), (1, ac_tab)):
        for th in range(1 if gray else 2):
            bits, vals = (_flat_table(list(range(12))) if tc == 0 else _flat_table(ac_syms))
            payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wtr = _BitWriter()
    pred = [0] * nc
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for i in range(nc):
            sh, sv = samp[i]
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    blk = padded[i][y0 : y0 + 8, x0 : x0 + 8]
                    pred[i] = _encode_block(wtr, blk, qtabs[i], pred[i], dc_tab, ac_tab)
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)
