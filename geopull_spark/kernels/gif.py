"""From-spec GIF codec (GIF87a/89a) — pure stdlib + numpy, no PIL.

Written from the public GIF89a specification: logical screen descriptor,
global/local color tables, LSB-first variable-width LZW (clear/EOI codes,
width bump at table size 2^width, 12-bit cap — note this differs from TIFF
§13 LZW, which is MSB-first with the early-change rule), the 4-pass
interlace row order, and 89a extension blocks (graphic control / comment /
application — skipped by sub-block structure).

Decode targets the crawl shape: FIRST frame → (h, w, 3) RGB uint8
(transparency index ignored — callers wanting alpha can re-derive it from
the GCE; animated GIFs return frame 1). Malformed input raises a clean
ValueError (never IndexError/struct.error), same crawl-robustness contract
as ``kernels/jpeg.py`` / ``kernels/png.py`` / ``kernels/tiff.py``; the LZW
output is bounded by the declared image size so corrupt streams cannot
balloon memory.

The encoder exists for hermetic fixtures (same ground rules as the other
codecs): palette-indexed input, real LZW compression symmetric with the
decoder, optional interlace, optional 89a GCE extension.

Reference anchor: the reference pipeline has no raster media at all; this
codec serves the engine's multimodal columns (SURVEY §2 training-data
operators, `operators/multimodal.py`).
"""

from __future__ import annotations

import struct

import numpy as np


def gif_lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, clear = 2^mcs, EOI = clear+1,
    code width mcs+1 → 12 bumping when the table reaches 2^width."""
    if not 2 <= min_code_size <= 8:  # roots are pixel bytes (palette ≤ 256)
        raise ValueError(f"gif: bad LZW minimum code size {min_code_size}")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    bitbuf = bitcnt = 0
    pos, n = 0, len(data)
    prev: bytes | None = None
    while True:
        while bitcnt < width:
            if pos >= n:
                return bytes(out)  # EOI may be omitted by sloppy writers
            bitbuf |= data[pos] << bitcnt  # LSB-first
            pos += 1
            bitcnt += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ValueError("gif: LZW first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: LZW code beyond table")
        out += entry
        if len(out) > max_out:
            raise ValueError("gif: LZW output exceeds declared image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    raise ValueError("gif: unreachable")


def gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Symmetric GIF LZW writer: clear up front, restart at 4096 entries."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, min_code_size + 1
    emit(clear, width)
    w = b""
    for i in range(len(data)):
        c = data[i: i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[w + c] = next_code
            # sync rule: the NEXT emitted code may reference this entry, so
            # width grows when the just-assigned value hits 2^width — the
            # decoder's table (one entry behind) reaches size 2^width at the
            # same emitted-code index and bumps in lockstep
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            next_code, width = eoi + 1, min_code_size + 1
        w = c
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _interlace_order(h: int) -> np.ndarray:
    """Row permutation: stored-row i belongs at displayed row order[i]."""
    return np.concatenate([np.arange(s, h, t) for s, t in _INTERLACE_PASSES
                           if s < h]).astype(np.int64)


def gif_decode(buf: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) RGB uint8 (first frame)."""
    try:
        return _gif_decode_impl(buf)
    except ValueError:
        raise
    except Exception as e:  # struct/index errors from corrupt data
        raise ValueError(f"malformed GIF ({type(e).__name__}: {e})") from e


def _gif_decode_impl(buf: bytes) -> np.ndarray:
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf[pos:pos + 3 * n], np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("gif: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1  # label
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1  # sub-block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        # image descriptor
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("gif: image outside logical screen")
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(buf[pos:pos + 3 * n], np.uint8)
            if len(ct) < 3 * n:
                raise ValueError("gif: truncated local color table")
            ct = ct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: no color table")
        if pos >= len(buf):
            raise ValueError("gif: truncated before LZW data")
        mcs = buf[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(buf) and buf[pos] != 0:
            ln = buf[pos]
            lzw += buf[pos + 1: pos + 1 + ln]
            if len(buf) < pos + 1 + ln:
                raise ValueError("gif: truncated image sub-block")
            pos += 1 + ln
        idx = np.frombuffer(gif_lzw_decode(bytes(lzw), mcs, w * h), np.uint8)
        if len(idx) < w * h:
            raise ValueError("gif: LZW data shorter than image")
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("gif: pixel index beyond color table")
        img = idx[: w * h].reshape(h, w)
        if iflags & 0x40:  # interlaced: reorder stored rows
            order = _interlace_order(h)
            full = np.empty_like(img)
            full[order] = img
            img = full
        return ct[img]  # palette lookup → (h, w, 3)
    raise ValueError("gif: no image data")


def gif_encode(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False, version: bytes = b"GIF89a",
               gce: bool = False) -> bytes:
    """Palette-indexed (h, w) uint8 + (n, 3) palette → GIF bytes.

    ``gce`` adds an 89a graphic-control extension block (decoder skip-path
    coverage). The color-table size is padded to the next power of two."""
    indices = np.asarray(indices, np.uint8)
    palette = np.asarray(palette, np.uint8)
    if indices.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("gif_encode: need (h, w) indices and (n, 3) palette")
    h, w = indices.shape
    n = len(palette)
    if n < 1 or n > 256 or int(indices.max(initial=0)) >= n:
        raise ValueError("gif_encode: palette size/index range invalid")
    bits = max(1, int(n - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[:n] = palette
    out = bytearray(version)
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if gce:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, no transparency
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    rows = indices[_interlace_order(h)] if interlace else indices
    mcs = max(2, bits)
    out.append(mcs)
    lzw = gif_lzw_encode(rows.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
