"""From-spec BMP (Windows DIB) codec — pure stdlib + numpy, no PIL.

Written from the public BITMAPFILEHEADER/BITMAPINFOHEADER layout: 'BM'
header with pixel-data offset, 40-byte info header (negative height =
top-down), BI_RGB only, bit depths 1/4/8 (BGRX palette quads, rows padded
to 4 bytes) and 24/32 (BGR/BGRA byte order). Decode returns (h, w, 3) RGB
uint8 (alpha dropped). RLE8 (comp==1) is fully decompressed (encoded runs,
EOL/EOF/delta escapes, word-padded absolute mode); RLE4 and bitfields
compression raise a clean ValueError — the crawl-robustness contract
shared with the other codecs.

The encoder exists for hermetic fixtures (same ground rules as the JPEG /
PNG / TIFF / GIF codecs).
"""

from __future__ import annotations

import struct

import numpy as np


def bmp_decode(buf: bytes) -> np.ndarray:
    try:
        return _bmp_decode_impl(buf)
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"malformed BMP ({type(e).__name__}: {e})") from e


def _bmp_decode_impl(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM" or len(buf) < 54:
        raise ValueError("not a BMP (bad signature or too short)")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"bmp: core/OS2 header ({hdr_size}) not supported")
    planes, bpp, comp, _isz, _xppm, _yppm, used, _imp = struct.unpack_from(
        "<HHIIiiII", buf, 26)
    if planes != 1:
        raise ValueError("bmp: planes != 1")
    if comp not in (0, 1):
        raise ValueError(f"bmp: compression {comp} not supported (BI_RGB/RLE8)")
    if comp == 1 and bpp != 8:
        raise ValueError("bmp: BI_RLE8 requires 8-bit pixels")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"bmp: {bpp}-bit not supported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("bmp: non-positive dimensions")
    pal = None
    if bpp <= 8:
        n = used or (1 << bpp)
        pal_off = 14 + hdr_size
        quads = np.frombuffer(buf[pal_off: pal_off + 4 * n], np.uint8)
        if len(quads) < 4 * n:
            raise ValueError("bmp: truncated palette")
        pal = quads.reshape(n, 4)[:, [2, 1, 0]]  # BGRX → RGB
    if comp == 1:  # BI_RLE8: (count, value) pairs + escapes (EOL/EOF/delta/abs)
        if top_down:
            raise ValueError("bmp: top-down RLE8 is invalid per the DIB spec")
        idx = _decode_rle8(buf[data_off:], w, h)[::-1]  # stored bottom-up
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("bmp: pixel index beyond palette")
        return pal[idx]
    stride = (w * bpp + 31) // 32 * 4  # rows padded to 4 bytes
    need = stride * h
    data = np.frombuffer(buf[data_off: data_off + need], np.uint8)
    if len(data) < need:
        raise ValueError("bmp: pixel data shorter than declared size")
    rows = data.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR → RGB
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)
        return px[:, :, [2, 1, 0]].copy()
    if bpp == 8:
        idx = rows[:, :w]
    else:  # 1/4-bit packed, MSB-first
        bits = np.unpackbits(rows, axis=1)
        vals = bits[:, : w * bpp].reshape(h, w, bpp)
        weights = 1 << np.arange(bpp - 1, -1, -1)
        idx = (vals * weights).sum(axis=2)
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("bmp: pixel index beyond palette")
    return pal[idx]


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 → (h, w) indices in STORED (bottom-up) row order. Escapes:
    00 00 end-of-line, 00 01 end-of-bitmap, 00 02 dx dy cursor delta,
    00 n>=3 absolute run of n literal bytes padded to a word boundary."""
    grid = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n_bytes = len(data)
    while i + 1 < n_bytes:
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run
            if y >= h or x + c > w:
                raise ValueError("bmp: RLE8 run outside the image")
            grid[y, x: x + c] = v
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return grid
        elif v == 2:  # delta
            if i + 2 > n_bytes:
                raise ValueError("bmp: truncated RLE8 delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("bmp: RLE8 delta outside the image")
        else:  # absolute mode: v literal bytes, word-aligned
            if i + v > n_bytes or y >= h or x + v > w:
                raise ValueError("bmp: RLE8 absolute run outside the image")
            grid[y, x: x + v] = np.frombuffer(data[i: i + v], np.uint8)
            i += v + (v & 1)
            x += v
    raise ValueError("bmp: RLE8 stream missing end-of-bitmap")


def _encode_rle8(idx: np.ndarray) -> bytes:
    """Fixture RLE8 writer: plain runs + EOL per stored row, EOF at end."""
    out = bytearray()
    for row in idx[::-1]:  # stored bottom-up
        x, w = 0, len(row)
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            out += bytes([run, int(row[x])])
            x += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def bmp_encode(img: np.ndarray, palette: np.ndarray | None = None,
               bpp: int | None = None, top_down: bool = False,
               rle8: bool = False) -> bytes:
    """RGB (h, w, 3) → 24-bit BMP, or palette indices (h, w) + (n, 3)
    palette → 1/4/8-bit BMP. Fixture writer."""
    if palette is not None:
        palette = np.asarray(palette, np.uint8)
        idx = np.asarray(img, np.uint8)
        bpp = bpp or 8
        if bpp not in (1, 4, 8) or idx.ndim != 2 or \
                int(idx.max(initial=0)) >= min(len(palette), 1 << bpp):
            raise ValueError("bmp_encode: bad palette/depth/index range")
        h, w = idx.shape
        n = len(palette)
        quads = np.zeros((n, 4), np.uint8)
        quads[:, [2, 1, 0]] = palette
        pal_bytes = quads.tobytes()
        if bpp == 8:
            rows = idx
        else:
            weights = np.arange(bpp - 1, -1, -1)
            bits = ((idx[..., None] >> weights) & 1).reshape(h, w * bpp)
            pad = (-bits.shape[1]) % 8
            if pad:
                bits = np.pad(bits, ((0, 0), (0, pad)))
            rows = np.packbits(bits.astype(np.uint8), axis=1)
    else:
        a = np.asarray(img, np.uint8)
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("bmp_encode: need (h, w, 3) RGB or a palette")
        h, w = a.shape[:2]
        bpp, n, pal_bytes = 24, 0, b""
        rows = a[:, :, ::-1].reshape(h, w * 3)  # RGB → BGR
    comp = 0
    if rle8:
        if palette is None or bpp != 8 or top_down:
            raise ValueError("bmp_encode: rle8 needs an 8-bit bottom-up palette image")
        data = _encode_rle8(rows)
        comp = 1
    else:
        stride = (w * bpp + 31) // 32 * 4
        padded = np.zeros((h, stride), np.uint8)
        padded[:, : rows.shape[1]] = rows
        if not top_down:
            padded = padded[::-1]
        data = padded.tobytes()
    data_off = 14 + 40 + len(pal_bytes)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
                       comp, len(data), 2835, 2835, n, 0)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
    return hdr + info + pal_bytes + data
