"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF — fully public).

Round 8: JPEG is the dominant image format of real web corpora; the
multimodal ``mode='real'`` path previously decoded PNG only.  This
module implements baseline sequential DCT JPEG:

- **decode**: SOF0/SOF1 (Huffman sequential), any sampling factors
  (4:4:4, 4:2:2, 4:2:0, ...), multiple DQT/DHT segments, restart
  markers (DRI/RSTn), byte-stuffed entropy data.  Huffman tables are
  reconstructed canonically from each file's own DHT segments, so
  files using the Annex K typical tables and files carrying optimized
  tables decode identically.  Progressive (SOF2), arithmetic coding
  and 12-bit precision raise NotImplementedError — honest seams.
- **encode**: gray or RGB, quality-scaled standard quantization
  matrices, optional 2x2 chroma subsampling, and SELF-BUILT canonical
  Huffman tables emitted in DHT (every symbol present in the image at
  one fixed code length — decoders read tables from the stream, so
  this is spec-exact; compression ratio is traded for table-free
  correctness).

Reference behavior parity: the reference pipelines treat imagery as
opaque arrays via PIL/GDAL; here the codec itself is part of the
engine so the 100 TB multimodal path has no C library dependency.
DCT/IDCT are exact orthonormal 8x8 matrix products in float64; pixel
error after a quality-Q round trip is bounded by the quantization
tables, which the tests assert via PSNR.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag[k] = (row, col) of the k-th coefficient
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

# standard quantization matrices (T.81 Annex K.1/K.2)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

# orthonormal 8x8 DCT basis: F = M @ f @ M.T ; f = M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for tbl in (_Q_LUMA, _Q_CHROMA):
        q = np.floor((tbl * scale + 50) / 100)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def marker(self, second: int) -> None:
        """Byte-align with 1-padding, then emit a bare marker (RSTn) —
        markers are not byte-stuffed."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        self.buf += bytes([0xFF, second])

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: decoders see padded 1-bits until the
                # scan layer consumes the marker explicitly
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, nbits: int) -> int:
        while self.n < nbits:
            self._fill()
        out = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1
        return out

    def align_marker(self) -> int:
        """Drop padding bits, consume one marker, return its second
        byte (0xD0-0xD7 for RSTn)."""
        self.acc = 0
        self.n = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


# ---------------------------------------------------------------------------
# canonical Huffman (the spec's BITS/HUFFVAL form)
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical code generation
    (codes assigned in huffval order, shorter lengths first)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _fixed_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL giving every present symbol one fixed-length code.
    Length L = ceil(log2(n+1)) keeps the all-ones code unused, so the
    1-padding at scan end can never alias a codeword prefix into a
    valid symbol beyond the last MCU."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())
    if (1 << length) - 1 < n:  # need the +1 headroom for all-ones
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _to_planes(pixels: np.ndarray) -> list[np.ndarray]:
    """RGB -> full-range JFIF YCbCr planes (float64); gray -> [Y]."""
    if pixels.ndim == 2:
        return [pixels.astype(np.float64)]
    rgb = pixels.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return [y, cb, cr]


def _block_grid(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (by, bx, 8, 8) with edge replication to multiples of 8."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // 8, 8, pw // 8, 8).swapaxes(1, 2)


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF JPEG from (H, W) gray or (H, W, 3) RGB uint8.
    ``subsample=True`` emits 4:2:0 chroma (2x2 box average), else
    4:4:4.  ``restart_interval=N`` emits DRI + an RSTn marker every N
    MCUs (DC predictors reset, scan byte-aligned).  Huffman tables are
    built from the image's own symbol set and written to DHT."""
    arr = np.asarray(pixels)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("jpeg_encode: expected (H,W) or (H,W,3) uint8")
    if arr.ndim == 3 and arr.shape[2] != 3:
        raise ValueError("jpeg_encode: color images must be RGB")
    h, w = arr.shape[:2]
    planes = _to_planes(arr)
    ncomp = len(planes)
    qluma, qchroma = _quality_tables(quality)
    if subsample and ncomp == 3:
        samp = [(2, 2), (1, 1), (1, 1)]
        for i in (1, 2):
            p = planes[i]
            ph, pw = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            planes[i] = (
                p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
    else:
        samp = [(1, 1)] * ncomp

    # quantized zigzag coefficients per component, blocks in raster order
    comp_zz: list[np.ndarray] = []
    for ci, plane in enumerate(planes):
        q = qluma if ci == 0 else qchroma
        grid = _block_grid(plane) - 128.0
        coef = np.einsum("ux,byxw,vw->byuv", _M, grid, _M)
        zz = np.round(coef / q).astype(np.int64)[:, :, _ZZ_ROWS, _ZZ_COLS]
        comp_zz.append(zz)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def mcu_blocks(my: int, mx: int):
        """(comp index, zz block) of one MCU in interleaved order."""
        for ci in range(ncomp):
            sh, sv = samp[ci]
            zzc = comp_zz[ci]
            for by in range(sv):
                for bx in range(sh):
                    r = min(my * sv + by, zzc.shape[0] - 1)
                    c = min(mx * sh + bx, zzc.shape[1] - 1)
                    yield ci, zzc[r, c]

    # pass 1: tokenize every block once (restart-aware DC diffs), so
    # the Huffman tables are built from exactly what pass 2 emits.
    # token = (cls, dc_diff, [(run_size_symbol, coef_value), ...])
    mcu_tokens: list[list[tuple[int, int, list[tuple[int, int]]]]] = []
    preds = [0] * ncomp
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        toks = []
        for ci, zz in mcu_blocks(my, mx):
            cls = 0 if ci == 0 else 1
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            acs: list[tuple[int, int]] = []
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0))
                    run -= 16
                acs.append(((run << 4) | _category(v), v))
                run = 0
            if run:
                acs.append((0x00, 0))  # EOB
            toks.append((cls, diff, acs))
        mcu_tokens.append(toks)

    ncls = 1 if ncomp == 1 else 2
    dc_syms: list[set[int]] = [set() for _ in range(ncls)]
    ac_syms: list[set[int]] = [set() for _ in range(ncls)]
    for toks in mcu_tokens:
        for cls, diff, acs in toks:
            dc_syms[cls].add(_category(diff))
            ac_syms[cls].update(sym for sym, _ in acs)
    for s in ac_syms:
        s.add(0x00)  # EOB is always a legal emission
    dc_tbl = [_fixed_table(dc_syms[c]) for c in range(ncls)]
    ac_tbl = [_fixed_table(ac_syms[c]) for c in range(ncls)]
    dc_codes = [_canonical_codes(*t) for t in dc_tbl]
    ac_codes = [_canonical_codes(*t) for t in ac_tbl]

    # pass 2: entropy-coded data
    bw = _BitWriter()

    def put_coef(v: int, cat: int) -> None:
        if cat:
            bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)

    for m, toks in enumerate(mcu_tokens):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + (m // restart_interval - 1) % 8)
        for cls, diff, acs in toks:
            cat = _category(diff)
            code, ln = dc_codes[cls][cat]
            bw.put(code, ln)
            put_coef(diff, cat)
            for sym, v in acs:
                code, ln = ac_codes[cls][sym]
                bw.put(code, ln)
                put_coef(v, sym & 0xF)
    scan = bw.flush()

    # ---- container ----
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate([qluma] + ([qchroma] if ncomp == 3 else [])):
        zzq = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([tq]) + zzq)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tq])
    out += seg(0xC0, sof)
    for cls in range(ncls):
        for tc, (bits, vals) in ((0, dc_tbl[cls]), (1, ac_tbl[cls])):
            out += seg(0xC4, bytes([(tc << 4) | cls]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


class _HuffDecoder:
    """Canonical length-indexed decode: min/max code per length plus
    the huffval offset — the T.81 F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def read(self, br: _BitReader) -> int:
        code = br.bits(1)
        ln = 1
        while code > self.maxcode[ln]:
            if ln >= 16:
                raise ValueError("jpeg: invalid Huffman code in scan")
            code = (code << 1) | br.bits(1)
            ln += 1
        return self.huffval[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG to (H, W) uint8 gray or (H, W, 3) uint8
    RGB.  Any sampling factors; chroma upsampled by pixel replication
    (the nearest-neighbor rule every codec path here uses)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg_decode: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg_decode: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT — multiple tables per segment
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quantization tables")
                zz = np.frombuffer(body, np.uint8, 64, off + 1).astype(np.float64)
                q = np.zeros((8, 8))
                q[_ZZ_ROWS, _ZZ_COLS] = zz
                qtables[tq] = q
                off += 65
        elif marker == 0xC4:  # DHT — multiple tables per segment
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline sequential
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            fh, fw = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise NotImplementedError("jpeg: progressive DCT")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"jpeg: SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg_decode: SOS before SOF")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame[2] if c["id"] == cs)
                scan_comps.append((comp, tt >> 4, tt & 0xF))
            fh, fw, _ = frame
            hmax = max(c["h"] for c in frame[2])
            vmax = max(c["v"] for c in frame[2])
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            coefs = []
            for comp, _, _ in scan_comps:
                coefs.append(
                    np.zeros((mcuy * comp["v"], mcux * comp["h"], 64), np.int64)
                )
            br = _BitReader(data, pos)
            preds = [0] * ns
            nmcu = mcuy * mcux
            for m in range(nmcu):
                if restart_interval and m and m % restart_interval == 0:
                    rst = br.align_marker()
                    if not 0xD0 <= rst <= 0xD7:
                        raise ValueError("jpeg: expected restart marker")
                    preds = [0] * ns
                my, mx = divmod(m, mcux)
                for si, (comp, td, ta) in enumerate(scan_comps):
                    dc = htables[(0, td)]
                    ac = htables[(1, ta)]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            zz = coefs[si][my * comp["v"] + by, mx * comp["h"] + bx]
                            cat = dc.read(br)
                            diff = _extend(br.bits(cat), cat) if cat else 0
                            preds[si] += diff
                            zz[0] = preds[si]
                            k = 1
                            while k < 64:
                                sym = ac.read(br)
                                if sym == 0x00:  # EOB
                                    break
                                run, cat = sym >> 4, sym & 0xF
                                if cat == 0 and run == 15:  # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    raise ValueError("jpeg: AC index overflow")
                                zz[k] = _extend(br.bits(cat), cat)
                                k += 1
            # reconstruct planes
            planes = []
            for si, (comp, _, _) in enumerate(scan_comps):
                q = qtables[comp["tq"]]
                grid = np.zeros(coefs[si].shape[:2] + (8, 8))
                grid[:, :, _ZZ_ROWS, _ZZ_COLS] = coefs[si]
                grid *= q
                px = np.einsum("xu,byuv,wv->byxw", _M.T, grid, _M.T)
                by, bx = px.shape[:2]
                plane = px.swapaxes(1, 2).reshape(by * 8, bx * 8) + 128.0
                plane = np.repeat(
                    np.repeat(plane, vmax // comp["v"], axis=0),
                    hmax // comp["h"],
                    axis=1,
                )
                planes.append(plane[:fh, :fw])
            if ns == 1:
                out = planes[0]
                return np.clip(np.round(out), 0, 255).astype(np.uint8)
            y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
            r = y + 1.402 * cr
            g = y - 0.344136286 * cb - 0.714136286 * cr
            b = y + 1.772 * cb
            rgb = np.stack([r, g, b], axis=2)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        # APPn / COM / anything else with a length: skipped
    raise ValueError("jpeg_decode: no scan data found")
