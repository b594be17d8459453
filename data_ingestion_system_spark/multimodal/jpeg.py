"""Baseline JPEG codec — pure numpy, no libjpeg.

Sequential DCT huffman JPEG (SOF0, the format >99% of training-corpus
JPEGs use at the baseline level) decodes with nothing but numpy: marker
parse → huffman entropy decode (with byte unstuffing and restart
markers) → dequantize → 8×8 IDCT (orthonormal DCT-II basis matrix) →
chroma upsample → YCbCr→RGB. Progressive (SOF2), arithmetic coding, and
12-bit precision raise NotImplementedError honestly.

The matching encoder (FDCT → quantize → huffman, ITU T.81 Annex K
standard tables, 4:4:4 or 4:2:0, optional restart interval) exists so
tests can roundtrip synthetic images without binary fixtures on disk —
JPEG is lossy, so roundtrips assert bounded error on smooth images, not
identity.

All tables below are from the public JPEG spec (ITU-T T.81 / ISO 10918-1
Annex K); the reference system (Chuyi111/Data-Ingestion-System) has no
image path at all — this is part of the mandated training-data-pipeline
extension surface (multimodal columns).

The decoder is built by a factory returning a SELF-CONTAINED closure
(all tables and helpers inside) so cloudpickle ships it by value to
executors that cannot import this package (see columns.py).
"""

from __future__ import annotations

# zigzag scan order: natural index of the k-th zigzag position (T.81 §A.3.6)
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# Annex K.1 quantization tables (zigzag order), quality-50 base
Q_LUMA = (
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101, 103, 99,
)
Q_CHROMA = (
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
)

# Annex K.3 huffman tables: (BITS counts for code lengths 1..16, HUFFVAL)
HT_DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
HT_DC_CHROMA = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
HT_AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)
HT_AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)


def _scaled_qtables(quality: int):
    """IJG quality scaling of the Annex K base tables (zigzag order)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} not in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (Q_LUMA, Q_CHROMA):
        out.append(tuple(min(255, max(1, (v * scale + 50) // 100)) for v in base))
    return out


def _canonical_codes(counts, symbols):
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 §C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def make_jpeg_decoder():
    """Factory → ``decode(payload: bytes) -> np.ndarray[(H, W, 3), u8]``.

    Baseline sequential (SOF0), 8-bit, huffman, grayscale or YCbCr with
    h/v sampling factors in {1, 2} (covers 4:4:4, 4:2:2, 4:2:0), DRI +
    restart markers. Progressive / arithmetic / 12-bit raise
    NotImplementedError.

    Entropy decode is table-driven: each huffman table becomes a
    65,536-entry peek LUT (16-bit window → packed symbol+code-length),
    so a symbol costs one list index instead of a dict probe per bit;
    magnitude bits are read in one masked shift. LUTs are cached in the
    factory scope keyed by the table bytes — a corpus of same-table
    JPEGs (e.g. everything Annex K) builds them once per executor.
    IDCT is batched: the scan loop only fills per-component coefficient
    arrays; dequantize + 8×8 DCT-III run as single broadcast matmuls
    over all blocks, and the MCU→plane scatter is one reshape/transpose.
    """
    zigzag = ZIGZAG
    lut_cache: dict = {}

    def build_lut(counts, symbols):
        # 16-bit peek window → (symbol << 5) | code_length; 0 = invalid.
        key = (counts, symbols)
        lut = lut_cache.get(key)
        if lut is not None:
            return lut
        lut = [0] * 65536
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                start = code << (16 - length)
                packed = (symbols[k] << 5) | length
                lut[start : start + (1 << (16 - length))] = [packed] * (
                    1 << (16 - length)
                )
                code += 1
                k += 1
            code <<= 1
        if len(lut_cache) >= 64:  # bound executor memory across corpora
            lut_cache.clear()
        lut_cache[key] = lut
        return lut

    def decode(payload: bytes):
        import numpy as np

        if payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG: bad SOI")

        qtables: dict[int, np.ndarray] = {}
        htables: dict[tuple[int, int], list] = {}  # (class, id) → peek LUT
        frame = None
        restart_interval = 0
        pos = 2

        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError(f"JPEG: expected marker at {pos}")
            marker = payload[pos + 1]
            while marker == 0xFF:  # T.81 B.1.1.2: 0xFF fill bytes before a marker
                pos += 1
                if pos + 4 > len(payload):
                    raise ValueError("truncated JPEG: fill bytes run off the end")
                marker = payload[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                raise ValueError("JPEG: EOI before scan data")
            seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            seg = payload[pos + 4 : pos + 2 + seglen]
            if len(seg) != seglen - 2:
                raise ValueError("truncated JPEG: segment cut short")
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 15
                    if pq != 0:
                        raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                    vals = np.zeros(64, np.int32)
                    for k in range(64):
                        vals[zigzag[k]] = seg[i + 1 + k]
                    qtables[tq] = vals.reshape(8, 8)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 15
                    counts = tuple(seg[i + 1 : i + 17])
                    n = sum(counts)
                    symbols = tuple(seg[i + 17 : i + 17 + n])
                    htables[(tc, th)] = build_lut(counts, symbols)
                    i += 17 + n
            elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline+extended seq
                if seg[0] != 8:
                    raise NotImplementedError(f"{seg[0]}-bit JPEG (8-bit only)")
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, tq))
                frame = (w, h, comps)
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"JPEG SOF{marker - 0xC0}: only baseline sequential (SOF0/1) supported"
                )
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    raise ValueError("JPEG: SOS before SOF")
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan.append((cs, tdta >> 4, tdta & 15))
                pos = pos + 2 + seglen
                break
            # APPn / COM / others: skip
            pos = pos + 2 + seglen
        else:
            raise ValueError("truncated JPEG: no SOS")

        w, h, comps = frame
        if w <= 0 or h <= 0:
            raise ValueError(f"JPEG: bad dimensions {w}x{h}")
        if len(comps) not in (1, 3):
            raise NotImplementedError(f"{len(comps)}-component JPEG (1 or 3 only)")
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax not in (1, 2) or vmax not in (1, 2):
            raise NotImplementedError("sampling factors beyond 2 not supported")

        # entropy-coded bytes: unstuff 0xFF00, split at restart markers.
        # bytes.find jumps marker-to-marker at C speed — the scan cost is
        # per-0xFF, not per-byte.
        segments = []
        buf = bytearray()
        i = pos
        n = len(payload)
        while True:
            j = payload.find(b"\xff", i)
            if j < 0 or j + 1 >= n:
                raise ValueError("truncated JPEG: no EOI")
            buf += payload[i:j]
            m = payload[j + 1]
            if m == 0x00:
                buf.append(0xFF)
                i = j + 2
            elif m == 0xFF:  # fill byte before a marker: re-scan from it
                i = j + 1
            elif 0xD0 <= m <= 0xD7:
                segments.append(bytes(buf))
                buf = bytearray()
                i = j + 2
            elif m == 0xD9:  # EOI
                break
            else:
                raise ValueError(f"JPEG: unexpected marker 0xFF{m:02X} in scan")
        segments.append(bytes(buf))

        # orthonormal 8x8 DCT-II basis: spatial = T.T @ F @ T
        x = np.arange(8)
        T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
        T[0] *= np.sqrt(0.5)
        T *= 0.5

        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        scan_by_id = {cs: (td, ta) for cs, td, ta in scan}

        # per-component quantized-coefficient arrays, filled by the scan
        # loop in (my, mx, by, bx) order; IDCT runs batched afterwards
        coeff = [
            np.zeros((mcuy * mcux * ch * cv, 64), np.float64)
            for _, ch, cv, _ in comps
        ]
        nblk = [0] * len(comps)

        # bit reader state over the current segment: bitbuf holds the
        # top `nbits` undelivered bits (nbits < 24 between calls)
        seg_idx = 0
        data = segments[0]
        ndata = len(data)
        bytepos = 0
        bitbuf = 0
        nbits = 0

        def huff(lut):
            # one 16-bit peek → packed (symbol << 5 | length) lookup
            nonlocal bytepos, bitbuf, nbits
            while nbits < 16 and bytepos < ndata:
                bitbuf = (bitbuf << 8) | data[bytepos]
                bytepos += 1
                nbits += 8
            if nbits >= 16:
                peek = (bitbuf >> (nbits - 16)) & 0xFFFF
            else:
                peek = (bitbuf << (16 - nbits)) & 0xFFFF  # zero-pad past end
            packed = lut[peek]
            length = packed & 31
            if length == 0:
                raise ValueError("JPEG: invalid huffman code")
            if length > nbits:
                raise ValueError("truncated JPEG: entropy data exhausted")
            nbits -= length
            bitbuf &= (1 << nbits) - 1
            return packed >> 5

        def receive_extend(s):
            # read s magnitude bits, sign-extend per T.81 §F.2.2.1
            nonlocal bytepos, bitbuf, nbits
            while nbits < s:
                if bytepos >= ndata:
                    raise ValueError("truncated JPEG: entropy data exhausted")
                bitbuf = (bitbuf << 8) | data[bytepos]
                bytepos += 1
                nbits += 8
            nbits -= s
            v = bitbuf >> nbits
            bitbuf &= (1 << nbits) - 1
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        pred = {cid: 0 for cid, *_ in comps}
        mcu_count = 0
        for _my in range(mcuy):
            for _mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("truncated JPEG: missing restart segment")
                    data = segments[seg_idx]
                    ndata = len(data)
                    bytepos = 0
                    bitbuf = 0
                    nbits = 0
                    pred = {cid: 0 for cid, *_ in comps}
                mcu_count += 1
                for ci, (cid, ch, cv, _tq) in enumerate(comps):
                    td, ta = scan_by_id[cid]
                    dctab, actab = htables[(0, td)], htables[(1, ta)]
                    co = coeff[ci]
                    bi = nblk[ci]
                    for _blk in range(cv * ch):
                        row = co[bi]
                        s = huff(dctab)
                        if s:
                            pred[cid] += receive_extend(s)
                        row[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = huff(actab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index beyond block")
                            row[zigzag[k]] = receive_extend(s)
                            k += 1
                        bi += 1
                    nblk[ci] = bi

        # dequantize + IDCT all blocks per component in one batched
        # matmul, then scatter MCU-ordered blocks to the plane with a
        # reshape/transpose (order is (my, mx, by, bx) by construction)
        full = []
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            deq = coeff[ci] * qtables[tq].reshape(1, 64)
            spatial = T.T @ deq.reshape(-1, 8, 8) @ T + 128.0
            p = (
                spatial.reshape(mcuy, mcux, cv, ch, 8, 8)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(mcuy * cv * 8, mcux * ch * 8)
            )
            # upsample to full resolution, crop
            if ch < hmax:
                p = np.repeat(p, hmax // ch, axis=1)
            if cv < vmax:
                p = np.repeat(p, vmax // cv, axis=0)
            full.append(p[:h, :w])
        if len(full) == 1:
            g = np.clip(full[0], 0, 255).astype(np.uint8)
            return np.repeat(g[:, :, None], 3, axis=2)
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

    return decode


def encode_jpeg(
    arr,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF JPEG bytes (pure numpy FDCT +
    Annex K huffman). ``subsample``: '444' or '420'. ``restart_interval``
    (in MCUs) emits DRI + RSTn markers so the decoder's restart path is
    testable. Lossy by design — roundtrips are approximate."""
    import numpy as np

    if subsample not in ("444", "420"):
        raise ValueError(f"subsample {subsample!r} not in ('444', '420')")
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape[0], arr.shape[1]
    qz_l, qz_c = _scaled_qtables(quality)  # zigzag order
    qnat = []
    for qz in (qz_l, qz_c):
        q = np.zeros(64, np.float64)
        for k in range(64):
            q[ZIGZAG[k]] = qz[k]
        qnat.append(q.reshape(8, 8))

    # RGB → YCbCr (JFIF)
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if subsample == "420":
        hs = vs = 2
        # pad to even before the 2x2 box filter
        ye = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
        cb = (ye[0::2, 0::2] + ye[0::2, 1::2] + ye[1::2, 0::2] + ye[1::2, 1::2]) / 4.0
        ce = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
        cr = (ce[0::2, 0::2] + ce[0::2, 1::2] + ce[1::2, 0::2] + ce[1::2, 1::2]) / 4.0
    else:
        hs = vs = 1

    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * vs))

    def pad_plane(p, th, tw):
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")

    y = pad_plane(y, mcuy * vs * 8, mcux * hs * 8)
    cb = pad_plane(cb, mcuy * 8, mcux * 8)
    cr = pad_plane(cr, mcuy * 8, mcux * 8)

    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    T[0] *= np.sqrt(0.5)
    T *= 0.5

    enc_dc = (_canonical_codes(*HT_DC_LUMA), _canonical_codes(*HT_DC_CHROMA))
    enc_ac = (_canonical_codes(*HT_AC_LUMA), _canonical_codes(*HT_AC_CHROMA))

    out = bytearray()
    bitacc = 0
    bitn = 0

    def put_bits(code, length):
        nonlocal bitacc, bitn
        bitacc = (bitacc << length) | code
        bitn += length
        while bitn >= 8:
            bitn -= 8
            byte = (bitacc >> bitn) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)

    def flush_bits():
        nonlocal bitacc, bitn
        if bitn:
            put_bits((1 << (8 - bitn)) - 1, 8 - bitn)  # pad with 1s

    def encode_block(plane, py, px, qn, which, pred):
        coeffs = T @ (plane[py : py + 8, px : px + 8] - 128.0) @ T.T
        quant = np.round(coeffs / qn).astype(np.int64)
        zz = quant.reshape(64)[list(ZIGZAG)]
        dc, ac = enc_dc[which], enc_ac[which]
        diff = int(zz[0]) - pred
        s = int(diff).bit_length() if diff else 0
        code, length = dc[s]
        put_bits(code, length)
        if s:
            bits = diff if diff > 0 else diff + (1 << s) - 1
            put_bits(bits, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac[0xF0]
                put_bits(code, length)
                run -= 16
            s = abs(v).bit_length()
            code, length = ac[(run << 4) | s]
            put_bits(code, length)
            bits = v if v > 0 else v + (1 << s) - 1
            put_bits(bits, s)
            run = 0
        if run:
            code, length = ac[0x00]
            put_bits(code, length)
        return int(zz[0])

    # --- headers ---
    head = bytearray(b"\xff\xd8")  # SOI
    head += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qz in ((0, qz_l), (1, qz_c)):
        head += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + bytes(qz)
    head += (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1])
    )
    for tc_th, (counts, symbols) in (
        (0x00, HT_DC_LUMA),
        (0x10, HT_AC_LUMA),
        (0x01, HT_DC_CHROMA),
        (0x11, HT_AC_CHROMA),
    ):
        head += (
            b"\xff\xc4"
            + (19 + len(symbols)).to_bytes(2, "big")
            + bytes([tc_th])
            + bytes(counts)
            + bytes(symbols)
        )
    if restart_interval:
        head += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    head += (
        b"\xff\xda"
        + (12).to_bytes(2, "big")
        + bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )

    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                flush_bits()
                out.append(0xFF)
                out.append(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            mcu_count += 1
            for by in range(vs):
                for bx in range(hs):
                    preds[0] = encode_block(
                        y, (my * vs + by) * 8, (mx * hs + bx) * 8, qnat[0], 0, preds[0]
                    )
            preds[1] = encode_block(cb, my * 8, mx * 8, qnat[1], 1, preds[1])
            preds[2] = encode_block(cr, my * 8, mx * 8, qnat[1], 1, preds[2])
    flush_bits()
    return bytes(head) + bytes(out) + b"\xff\xd9"


decode_jpeg = make_jpeg_decoder()
