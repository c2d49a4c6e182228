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


def _prepare_encode(
    pixels: np.ndarray, quality: int, subsample: bool, caller: str
) -> tuple:
    """Shared encode front half: color transform, optional 4:2:0,
    quantized zigzag coefficients, sampling geometry."""
    arr = np.asarray(pixels)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError(f"{caller}: expected (H,W) or (H,W,3) uint8")
    if arr.ndim == 3 and arr.shape[2] != 3:
        raise ValueError(f"{caller}: color images must be RGB")
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
    return h, w, ncomp, samp, comp_zz, qluma, qchroma, hmax, vmax, mcux, mcuy


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _headers(
    h: int,
    w: int,
    ncomp: int,
    samp: list,
    qluma: np.ndarray,
    qchroma: np.ndarray,
    sof_marker: int,
) -> bytearray:
    """SOI + JFIF + DQT + SOF; DHT/DRI/SOS appended by the caller."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate([qluma] + ([qchroma] if ncomp == 3 else [])):
        zzq = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += _seg(0xDB, bytes([tq]) + zzq)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tq])
    out += _seg(sof_marker, sof)
    return out


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
    h, w, ncomp, samp, comp_zz, qluma, qchroma, hmax, vmax, mcux, mcuy = (
        _prepare_encode(pixels, quality, subsample, "jpeg_encode")
    )

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
    out = _headers(h, w, ncomp, samp, qluma, qchroma, 0xC0)
    for cls in range(ncls):
        for tc, (bits, vals) in ((0, dc_tbl[cls]), (1, ac_tbl[cls])):
            out += _seg(0xC4, bytes([(tc << 4) | cls]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_progressive(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    scans: "list[tuple[list[int] | None, int, int, int, int]] | None" = None,
) -> bytes:
    """Progressive (SOF2) JFIF JPEG.  ``scans`` is a scan script of
    (component indices or None for all, Ss, Se, Ah, Al) tuples; the
    default is the standard four-phase script (interleaved DC first at
    Al=1, per-component AC first Ss=1..63 with EOB-run coding,
    interleaved DC refinement raw bits, per-component AC refinement
    correction bits per T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine).
    Spectral bands (e.g. AC 1..5 then 6..63) and deeper
    successive-approximation ladders (Al=2 → 1 → 0) are supported —
    each band/level must refine the same band from Ah = previous Al.
    Each Huffman scan carries its own DHT built from exactly its
    symbol set.  Decoding a progressive encode is bit-identical to
    decoding the baseline encode of the same pixels (same quantized
    coefficients)."""
    h, w, ncomp, samp, comp_zz, qluma, qchroma, hmax, vmax, mcux, mcuy = (
        _prepare_encode(pixels, quality, subsample, "jpeg_encode_progressive")
    )
    if scans is None:
        scans = (
            [(None, 0, 0, 0, 1)]
            + [([ci], 1, 63, 0, 1) for ci in range(ncomp)]
            + [(None, 0, 0, 1, 0)]
            + [([ci], 1, 63, 1, 0) for ci in range(ncomp)]
        )

    def comp_blocks(ci: int):
        """Component blocks in raster order — comp_zz already has the
        TRUE per-component block dims (ceil(samples/8), no MCU pad),
        which is exactly what a non-interleaved scan covers."""
        zzc = comp_zz[ci]
        for r in range(zzc.shape[0]):
            for c in range(zzc.shape[1]):
                yield zzc[r, c]

    def mcu_dc_blocks():
        """(ci, zz) per block in interleaved MCU order."""
        for m in range(mcuy * mcux):
            my, mx = divmod(m, mcux)
            for ci in range(ncomp):
                sh, sv = samp[ci]
                zzc = comp_zz[ci]
                for by in range(sv):
                    for bx in range(sh):
                        r = min(my * sv + by, zzc.shape[0] - 1)
                        c = min(mx * sh + bx, zzc.shape[1] - 1)
                        yield ci, zzc[r, c]

    # tokens per scan: list of (cls_or_None, symbol, [(value, nbits)...])
    def scan_segment(tokens, tables):
        """Huffman-code one scan's tokens; tables maps class -> codes."""
        bw_ = _BitWriter()
        for cls, sym, extras in tokens:
            if sym is not None:
                code, ln = tables[cls][sym]
                bw_.put(code, ln)
            for v, nb in extras:
                if nb:
                    bw_.put(v, nb)
        return bw_.flush()

    def dht_for(tokens, tc: int) -> tuple[bytes, dict]:
        """One DHT segment per class present in tokens + code dicts."""
        syms: dict[int, set] = {}
        for cls, sym, _ in tokens:
            if sym is not None:
                syms.setdefault(cls, set()).add(sym)
        seg_bytes = b""
        codes = {}
        for cls in sorted(syms):
            bits, vals = _fixed_table(syms[cls])
            seg_bytes += _seg(
                0xC4, bytes([(tc << 4) | cls]) + bytes(bits) + bytes(vals)
            )
            codes[cls] = _canonical_codes(bits, vals)
        return seg_bytes, codes

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al_: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            cls = 0 if cid == 1 else 1
            body += bytes([cid, (cls << 4) | cls])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al_]))

    out = _headers(h, w, ncomp, samp, qluma, qchroma, 0xC2)

    def flush_eob(toks_, cls, eobrun_, pending_bits):
        if eobrun_:
            nb = eobrun_.bit_length() - 1
            toks_.append((cls, nb << 4, [(eobrun_ - (1 << nb), nb)]))
            toks_.extend((cls, None, [(b, 1)]) for b in pending_bits)
            pending_bits.clear()
        return 0

    for comp_sel, ss, se, ah, al in scans:
        comp_ids = (
            list(range(1, ncomp + 1)) if comp_sel is None else [c + 1 for c in comp_sel]
        )
        if ss == 0 and comp_ids != list(range(1, ncomp + 1)):
            raise ValueError(
                "jpeg_encode_progressive: DC scans here cover all components"
            )
        if ss == 0 and ah == 0:
            # DC first: interleaved, point transform = arithmetic shift
            preds = [0] * ncomp
            toks = []
            for ci, zz in mcu_dc_blocks():
                cls = 0 if ci == 0 else 1
                v = int(zz[0]) >> al
                diff = v - preds[ci]
                preds[ci] = v
                cat = _category(diff)
                toks.append(
                    (cls, cat, [(diff if diff >= 0 else diff + (1 << cat) - 1, cat)])
                )
            dht, codes = dht_for(toks, 0)
            out += dht
            out += sos_header(comp_ids, 0, 0, 0, al)
            out += scan_segment(toks, codes)
        elif ss == 0:
            # DC refinement: one raw bit per block, no Huffman
            bw_ = _BitWriter()
            for _, zz in mcu_dc_blocks():
                bw_.put((int(zz[0]) >> al) & 1, 1)
            out += sos_header(comp_ids, 0, 0, ah, al)
            out += bw_.flush()
        elif ah == 0:
            # AC first over band [ss, se] with EOB runs
            for ci in comp_sel if comp_sel is not None else range(ncomp):
                cls = 0 if ci == 0 else 1
                toks = []
                eobrun = 0
                for zz in comp_blocks(ci):
                    vals = [int(v) for v in zz]
                    shifted = [
                        (abs(v) >> al) * (1 if v >= 0 else -1) for v in vals
                    ]
                    nz = [k for k in range(ss, se + 1) if shifted[k]]
                    if not nz:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            eobrun = flush_eob(toks, cls, eobrun, [])
                        continue
                    eobrun = flush_eob(toks, cls, eobrun, [])
                    k = ss
                    for pos_ in nz:
                        run = pos_ - k
                        while run > 15:
                            toks.append((cls, 0xF0, []))
                            run -= 16
                        v = shifted[pos_]
                        cat = _category(v)
                        toks.append(
                            (
                                cls,
                                (run << 4) | cat,
                                [(v if v >= 0 else v + (1 << cat) - 1, cat)],
                            )
                        )
                        k = pos_ + 1
                    if k <= se:
                        eobrun += 1
                flush_eob(toks, cls, eobrun, [])
                dht, codes = dht_for(toks, 1)
                out += dht
                out += sos_header([ci + 1], ss, se, 0, al)
                out += scan_segment(toks, codes)
        else:
            # AC refinement over band [ss, se]: Ah = al+1 -> Al = al
            for ci in comp_sel if comp_sel is not None else range(ncomp):
                cls = 0 if ci == 0 else 1
                toks = []
                eobrun = 0
                pending: list[int] = []  # correction bits riding the EOB run
                for zz in comp_blocks(ci):
                    vals = [int(v) for v in zz]
                    absv = [abs(v) >> al for v in vals]
                    eob_idx = ss - 1
                    for k in range(ss, se + 1):
                        if absv[k] == 1:
                            eob_idx = k
                    r = 0
                    br_local: list[int] = []
                    for k in range(ss, se + 1):
                        t = absv[k]
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and k <= eob_idx:
                            eobrun = flush_eob(toks, cls, eobrun, pending)
                            toks.append((cls, 0xF0, []))
                            toks.extend((cls, None, [(b, 1)]) for b in br_local)
                            br_local = []
                            r -= 16
                        if t > 1:  # history-nonzero: correction bit only
                            br_local.append(t & 1)
                            continue
                        eobrun = flush_eob(toks, cls, eobrun, pending)
                        toks.append(
                            (cls, (r << 4) | 1, [(1 if vals[k] >= 0 else 0, 1)])
                        )
                        toks.extend((cls, None, [(b, 1)]) for b in br_local)
                        br_local = []
                        r = 0
                    if r > 0 or br_local:
                        eobrun += 1
                        pending.extend(br_local)
                        if eobrun == 0x7FFF:
                            eobrun = flush_eob(toks, cls, eobrun, pending)
                flush_eob(toks, cls, eobrun, pending)
                dht, codes = dht_for(toks, 1)
                out += dht
                out += sos_header([ci + 1], ss, se, ah, al)
                out += scan_segment(toks, codes)

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


def _scan_units(frame: dict, scan_comps: list) -> "list[list[tuple[int, int, int]]]":
    """Restart units of one scan as lists of (scan index, block row,
    block col).  Interleaved scans iterate the MCU grid (T.81 A.2.3);
    single-component scans iterate the COMPONENT's own block grid
    (A.2.2) — its true block dims, not the MCU-padded ones."""
    if len(scan_comps) == 1:
        comp = scan_comps[0][0]
        return [[(0, r, c)] for r in range(comp["bh"]) for c in range(comp["bw"])]
    out = []
    for m in range(frame["mcuy"] * frame["mcux"]):
        my, mx = divmod(m, frame["mcux"])
        unit = []
        for si, (comp, _, _) in enumerate(scan_comps):
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    unit.append((si, my * comp["v"] + by, mx * comp["h"] + bx))
        out.append(unit)
    return out


def _refine_nonzero(br: _BitReader, zz: np.ndarray, k: int, p1: int) -> None:
    """One AC-refinement correction bit (T.81 G.2.2.3 / libjpeg
    decode_mcu_AC_refine): a 1-bit adds p1 toward the coefficient's
    sign if bit Al is not already set."""
    if br.bits(1) and (zz[k] & p1) == 0:
        zz[k] += p1 if zz[k] >= 0 else -p1


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    body: bytes,
    coefs: list[np.ndarray],
    qtables: dict,
    htables: dict,
    restart_interval: int,
) -> int:
    """Decode one SOS entropy segment into the frame's coefficient
    arrays; returns the byte offset of the next marker.  Handles
    baseline sequential scans and all four progressive scan kinds
    (DC/AC × first/refinement)."""
    ns = body[0]
    scan_comps = []
    for i in range(ns):
        cs, tt = body[1 + 2 * i], body[2 + 2 * i]
        idx, comp = next(
            (j, c) for j, c in enumerate(frame["comps"]) if c["id"] == cs
        )
        scan_comps.append((comp, tt >> 4, tt & 0xF, idx))
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
    progressive = frame["progressive"]
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        if ss > 0 and ns != 1:
            raise ValueError("jpeg: progressive AC scan must be single-component")
    units = _scan_units(frame, [(c, td, ta) for c, td, ta, _ in scan_comps])
    br = _BitReader(data, pos)
    preds = [0] * ns
    eobrun = 0
    for m, unit in enumerate(units):
        if restart_interval and m and m % restart_interval == 0:
            rst = br.align_marker()
            if not 0xD0 <= rst <= 0xD7:
                raise ValueError("jpeg: expected restart marker")
            preds = [0] * ns
            eobrun = 0
        for si, r, c in unit:
            comp, td, ta, idx = scan_comps[si]
            zz = coefs[idx][r, c]
            if not progressive:
                dc = htables[(0, td)]
                ac = htables[(1, ta)]
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
            elif ss == 0 and ah == 0:  # DC first (G.2.1)
                cat = htables[(0, td)].read(br)
                diff = _extend(br.bits(cat), cat) if cat else 0
                preds[si] += diff
                zz[0] = preds[si] << al
            elif ss == 0:  # DC refinement: one raw bit per block
                zz[0] |= br.bits(1) << al
            elif ah == 0:  # AC first with EOB runs (G.2.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                ac = htables[(1, ta)]
                k = ss
                while k <= se:
                    sym = ac.read(br)
                    run, cat = sym >> 4, sym & 0xF
                    if cat == 0:
                        if run < 15:  # EOBn
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += br.bits(run)
                            break
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > se:
                        raise ValueError("jpeg: AC index overflow")
                    zz[k] = _extend(br.bits(cat), cat) << al
                    k += 1
            else:  # AC refinement (G.2.2.3)
                p1 = 1 << al
                ac = htables[(1, ta)]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = ac.read(br)
                        run, cat = sym >> 4, sym & 0xF
                        val = 0
                        if cat == 0:
                            if run < 15:  # EOBn
                                # full (1<<r)+extra here — the tail below
                                # runs for THIS block too and decrements,
                                # unlike the AC-first path whose break
                                # alone consumes the current block
                                eobrun = 1 << run
                                if run:
                                    eobrun += br.bits(run)
                                break
                            # ZRL: skip 16 history-zero coefficients
                        elif cat == 1:
                            val = p1 if br.bits(1) else -p1
                        else:
                            raise ValueError("jpeg: bad refinement symbol")
                        while k <= se:
                            if zz[k]:
                                _refine_nonzero(br, zz, k, p1)
                            else:
                                if run == 0:
                                    break
                                run -= 1
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k]:
                            _refine_nonzero(br, zz, k, p1)
                        k += 1
                    eobrun -= 1
    # advance to the next marker (skip pad bits / stuffed bytes)
    pos = br.pos
    while pos + 1 < len(data) and (
        data[pos] != 0xFF or data[pos + 1] in (0x00,) or 0xD0 <= data[pos + 1] <= 0xD7
    ):
        pos += 1
    return pos


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG to (H, W)
    uint8 gray or (H, W, 3) uint8 RGB.  Scans accumulate into
    per-component coefficient arrays (progressive files carry many);
    reconstruction happens once at EOI.  Any sampling factors; chroma
    upsampled by pixel replication (the nearest-neighbor rule every
    codec path here uses)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg_decode: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame: dict | None = None
    coefs: list[np.ndarray] = []
    scanned = False
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
                if pq == 0:  # 8-bit entries
                    zz = np.frombuffer(body, np.uint8, 64, off + 1).astype(np.float64)
                    off += 65
                elif pq == 1:  # 16-bit big-endian entries (Pq=1, T.81 B.2.4.1)
                    zz = (
                        np.frombuffer(body, ">u2", 64, off + 1).astype(np.float64)
                    )
                    off += 129
                else:
                    raise ValueError(f"jpeg: bad DQT precision {pq}")
                q = np.zeros((8, 8))
                q[_ZZ_ROWS, _ZZ_COLS] = zz
                qtables[tq] = q
        elif marker == 0xC4:  # DHT — multiple tables per segment
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            fh, fw = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # true per-component block dims (ceil of sample dims / 8)
                c["bw"] = (fw * c["h"] + 8 * hmax - 1) // (8 * hmax)
                c["bh"] = (fh * c["v"] + 8 * vmax - 1) // (8 * vmax)
            frame = {
                "fh": fh,
                "fw": fw,
                "comps": comps,
                "hmax": hmax,
                "vmax": vmax,
                "mcux": mcux,
                "mcuy": mcuy,
                "progressive": marker == 0xC2,
            }
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64) for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"jpeg: SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg_decode: SOS before SOF")
            pos = _decode_scan(
                data, pos, frame, body, coefs, qtables, htables, restart_interval
            )
            scanned = True
        # APPn / COM / anything else with a length: skipped
    if frame is None or not scanned:
        raise ValueError("jpeg_decode: no scan data found")
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        q = qtables[comp["tq"]]
        grid = np.zeros(coefs[ci].shape[:2] + (8, 8))
        grid[:, :, _ZZ_ROWS, _ZZ_COLS] = coefs[ci]
        grid *= q
        px = np.einsum("xu,byuv,wv->byxw", _M.T, grid, _M.T)
        by, bx = px.shape[:2]
        plane = px.swapaxes(1, 2).reshape(by * 8, bx * 8) + 128.0
        plane = np.repeat(
            np.repeat(plane, frame["vmax"] // comp["v"], axis=0),
            frame["hmax"] // comp["h"],
            axis=1,
        )
        planes.append(plane[: frame["fh"], : frame["fw"]])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
