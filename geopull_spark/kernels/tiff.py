"""From-spec baseline GeoTIFF codec (TIFF 6.0 + GeoTIFF 1.1 georeferencing).

The zonal join (J9, ``operators/spatial_join.py:zonal_aggregate``) consumes a
raster-tile table keyed by cell; this module is the bridge from an actual
GeoTIFF file to that table. Written from the public specifications (TIFF 6.0
§2-§8: header / IFD / strip + tile layouts; GeoTIFF ModelPixelScaleTag 33550 /
ModelTiepointTag 33922) — no external imaging library, same ground rules as
``kernels/jpeg.py`` / ``kernels/png.py``.

Decode support (the north-up population-raster shape):
  - both byte orders (II little / MM big), classic 32-bit TIFF AND BigTIFF
    (magic 43, u64 offsets/counts, LONG8/SLONG8/IFD8 field types) — classic
    TIFF caps chunk offsets at 4 GiB, so the >4 GiB rasters the distributed
    reader is built for require BigTIFF
  - strip-based and tiled layouts, PlanarConfiguration 1, 1 sample/pixel
  - Compression 1 (none), 5 (LZW, §13), 8 (zlib/Adobe deflate) and
    32773 (PackBits, §9); Predictor 1, 2 (horizontal differencing) and
    3 (floating-point byte-plane differencing, TechNote 3)
  - BitsPerSample 8/16/32, SampleFormat 1 (uint) / 2 (int) / 3 (IEEE float)
  - georeferencing from ModelPixelScale + ModelTiepoint (no rotation — the
    ModelTransformationTag 34264 affine-with-rotation form raises)
  - GDAL_NODATA (tag 42113) surfaced as ``meta["nodata"]``

Anything else (JPEG-in-TIFF, palette, planar=2, multi-sample) raises a
clean ValueError — crawl-robustness contract shared with the other codecs
(decode_media's ``on_error="skip"`` quarantines it).

The header/IFD parse is split from pixel decode on purpose: a Spark reader
parses the few-KB IFD once on the driver and ships per-strip/tile byte
ranges to executors (``sources/raster.py``), so a 100 GB raster never passes
through the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tag ids (TIFF 6.0 §8, GeoTIFF 1.1 §7, GDAL nodata convention)
_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_MODEL_TRANSFORMATION = 34264
_TAG_GEO_KEYS = 34735
_TAG_GDAL_NODATA = 42113

# field type → (struct fmt char, byte size); TIFF 6.0 §2 type codes
_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("c", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL (2×LONG)
    6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
    11: ("f", 4), 12: ("d", 8),
    16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8),  # BigTIFF LONG8/SLONG8/IFD8
}


def lzw_decode(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first bit packing, ClearCode 256 /
    EOI 257, code width 9→12 with the TIFF "early change" (width bumps when
    the NEXT table entry to be added is 2^width − 1). ``max_out`` bounds the
    output so a corrupt stream cannot balloon memory (clean ValueError)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bitbuf = bitcnt = 0
    width = 9
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while bitcnt < width:
            if pos >= n:
                # streams may omit EOI right at the byte boundary
                if prev is None or bitbuf & ((1 << bitcnt) - 1) == 0 or bitcnt < 8:
                    return bytes(out)
                raise ValueError("tiff: LZW stream truncated mid-code")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == 256:  # Clear
            table = table[:258]
            width, prev = 9, None
            continue
        if code == 257:  # EOI
            return bytes(out)
        if prev is None:
            if code > 255:
                raise ValueError("tiff: LZW first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("tiff: LZW code beyond table")
        out += entry
        if max_out is not None and len(out) > max_out:
            raise ValueError("tiff: LZW output exceeds expected chunk size")
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early change: bump width when the NEXT entry would be 2^width − 1
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


def lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW writer (tests + synthetic rasters): emits Clear up
    front and on table overflow at 4094 entries, early-change widths,
    MSB-first packing — symmetric with :func:`lzw_decode`."""
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)
    w = b""
    for i in range(len(data)):
        c = data[i: i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        if next_code <= 4093:  # spec reserves 4094/4095
            table[w + c] = next_code
            next_code += 1
            # encoder bumps one entry later than the decoder's early-change
            # check: the decoder's table lags one entry behind (it can only
            # build entry k after reading the k-th code), so both sides
            # cross 2^width at the same emitted code
            if next_code == (1 << width) and width < 12:
                width += 1
        else:  # table full → Clear and restart the dictionary
            emit(256, width)
            table = {bytes([j]): j for j in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        emit(table[w], width)
    emit(257, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF PackBits (TIFF 6.0 §9): n in 0..127 → copy n+1 literals;
    n in -127..-1 → repeat next byte 1−n times; −128 → no-op."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1
            if pos + h + 1 > n:
                raise ValueError("tiff: PackBits literal run beyond EOF")
            out += data[pos: pos + h + 1]
            pos += h + 1
        elif h > 128:  # replicate next byte 257-h times
            if pos >= n:
                raise ValueError("tiff: PackBits replicate run beyond EOF")
            out += data[pos: pos + 1] * (257 - h)
            pos += 1
        # h == 128: no-op
        if max_out is not None and len(out) > max_out:
            raise ValueError("tiff: PackBits output exceeds expected chunk size")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits writer: greedy runs ≥3 become replicates, the rest
    literal runs ≤128 (the spec's recommended packing)."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            while lit_start < i:  # flush pending literals
                take = min(128, i - lit_start)
                out.append(take - 1)
                out += data[lit_start: lit_start + take]
                lit_start += take
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    while lit_start < i:
        take = min(128, i - lit_start)
        out.append(take - 1)
        out += data[lit_start: lit_start + take]
        lit_start += take
    return bytes(out)


def _read_ifd_entries(data: bytes, bo: str, ifd_off: int,
                      big: bool = False) -> tuple[dict[int, list], int]:
    # classic: u16 count, 12-byte entries (count u32 @4, value u32 @8);
    # BigTIFF: u64 count, 20-byte entries (count u64 @4, value u64 @12)
    cnt_fmt, cnt_sz, ent_sz = ("Q", 8, 20) if big else ("H", 2, 12)
    val_at, inline_max, off_fmt = (12, 8, "Q") if big else (8, 4, "I")
    if ifd_off + cnt_sz > len(data):
        raise ValueError("tiff: IFD offset beyond EOF")
    (n_entries,) = struct.unpack_from(bo + cnt_fmt, data, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n_entries):
        off = ifd_off + cnt_sz + ent_sz * i
        if off + ent_sz > len(data):
            raise ValueError("tiff: truncated IFD")
        tag, ftype = struct.unpack_from(bo + "HH", data, off)
        (count,) = struct.unpack_from(bo + ("Q" if big else "I"), data, off + 4)
        if ftype not in _TYPES:
            continue  # unknown field type: skip per TIFF 6.0 reader guidance
        fmt, size = _TYPES[ftype]
        total = size * count
        if total <= inline_max:
            voff = off + val_at
        else:
            (voff,) = struct.unpack_from(bo + off_fmt, data, off + val_at)
        if voff + total > len(data):
            raise ValueError(f"tiff: tag {tag} value beyond EOF")
        if ftype == 2:  # ASCII
            raw = data[voff: voff + count]
            tags[tag] = [raw.split(b"\x00")[0].decode("ascii", "replace")]
        elif ftype in (5, 10):  # RATIONALs → floats
            vals = struct.unpack_from(bo + fmt * count, data, voff)
            tags[tag] = [vals[2 * j] / (vals[2 * j + 1] or 1) for j in range(count)]
        else:
            tags[tag] = list(struct.unpack_from(bo + fmt * count, data, voff))
    ptr_at = ifd_off + cnt_sz + ent_sz * n_entries
    next_off = 0
    if ptr_at + (8 if big else 4) <= len(data):
        (next_off,) = struct.unpack_from(bo + off_fmt, data, ptr_at)
    return tags, next_off


def tiff_parse_meta(data: bytes) -> dict:
    """Parse header + first IFD into a metadata dict — NO pixel decode.

    Returns width/height, dtype, layout (``"strip"`` | ``"tile"``), per-chunk
    (offset, bytecount) lists, chunk grid shape, compression/predictor, and
    the GeoTIFF affine (lon0, lat0 of the raster's top-left OUTER corner,
    pixel sizes). This is the driver-side half of the distributed reader."""
    if len(data) < 8:
        raise ValueError("tiff: shorter than header")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic == 42:
        big = False
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    elif magic == 43:  # BigTIFF: u16 offset-size(8), u16 zero, u64 IFD offset
        if len(data) < 16:
            raise ValueError("tiff: BigTIFF shorter than header")
        osz, zero, ifd_off = struct.unpack_from(bo + "HHQ", data, 4)
        if osz != 8 or zero != 0:
            raise ValueError("tiff: bad BigTIFF header")
        big = True
    else:
        raise ValueError("tiff: bad magic")
    t, _ = _read_ifd_entries(data, bo, ifd_off, big)
    return _meta_from_tags(t, bo, big)


def tiff_parse_overviews(data: bytes) -> list[dict]:
    """Parse the FULL IFD chain — cloud-optimized GeoTIFFs append reduced-
    resolution overview IFDs (NewSubfileType=1) after the full-res one.
    Returns one meta dict per level, finest first. Overview IFDs without
    their own geo tags (the GDAL convention: geo lives on IFD 0 only)
    inherit the level-0 anchor with pixel size scaled by the width ratio.

    The scale win this enables: a coarse zonal query can read overview
    level k and touch ~4^-k of the bytes."""
    if len(data) < 8:
        raise ValueError("tiff: shorter than header")
    bo = {"II": "<", "MM": ">"}.get(data[:2].decode("latin1"))
    if bo is None:
        raise ValueError("tiff: bad byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    big = magic == 43
    if big:
        _, _, ifd_off = struct.unpack_from(bo + "HHQ", data, 4)
    else:
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    metas: list[dict] = []
    seen: set[int] = set()
    while ifd_off and ifd_off not in seen:  # cycle guard on corrupt chains
        seen.add(ifd_off)
        t, ifd_off = _read_ifd_entries(data, bo, int(ifd_off), big)
        metas.append(_meta_from_tags(t, bo, big,
                                     parent=metas[0] if metas else None))
    if not metas:
        raise ValueError("tiff: empty IFD chain")
    return metas


def _meta_from_tags(t: dict[int, list], bo: str, big: bool,
                    parent: dict | None = None) -> dict:
    def one(tag: int, default=None):
        v = t.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff: required tag {tag} missing")
            return default
        return v[0]

    width, height = int(one(_TAG_WIDTH)), int(one(_TAG_LENGTH))
    if width <= 0 or height <= 0:
        raise ValueError("tiff: non-positive dimensions")
    if int(one(_TAG_SAMPLES_PER_PIXEL, 1)) != 1:
        raise ValueError("tiff: only 1 sample/pixel supported")
    if int(one(_TAG_PLANAR, 1)) != 1:
        raise ValueError("tiff: planar configuration 2 not supported")
    comp = int(one(_TAG_COMPRESSION, 1))
    if comp not in (1, 5, 8, 32773):
        raise ValueError(
            f"tiff: compression {comp} not supported (none/LZW/deflate/PackBits only)")
    pred = int(one(_TAG_PREDICTOR, 1))
    if pred not in (1, 2, 3):
        raise ValueError(f"tiff: predictor {pred} not supported")
    bits = int(one(_TAG_BITS, 8))
    sfmt = int(one(_TAG_SAMPLE_FORMAT, 1))
    dtype = {
        (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
        (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
        (3, 32): "f4",
    }.get((sfmt, bits))
    if dtype is None:
        raise ValueError(f"tiff: sample format {sfmt}/{bits}-bit not supported")
    if pred == 2 and dtype == "f4":
        raise ValueError("tiff: predictor 2 on float samples not supported (use 3)")
    if pred == 3 and dtype != "f4":
        raise ValueError("tiff: predictor 3 requires float samples")

    if _TAG_TILE_OFFSETS in t:
        tw, th = int(one(_TAG_TILE_WIDTH)), int(one(_TAG_TILE_LENGTH))
        if tw % 16 or th % 16:
            raise ValueError("tiff: tile dims must be multiples of 16")
        offsets, counts = t[_TAG_TILE_OFFSETS], t[_TAG_TILE_COUNTS]
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        layout, cw, ch = "tile", tw, th
    else:
        if _TAG_STRIP_OFFSETS not in t:
            raise ValueError("tiff: neither strip nor tile offsets present")
        rps = int(one(_TAG_ROWS_PER_STRIP, height))
        offsets, counts = t[_TAG_STRIP_OFFSETS], t.get(_TAG_STRIP_COUNTS)
        if counts is None:
            raise ValueError("tiff: StripByteCounts missing")
        across, down = 1, (height + rps - 1) // rps
        layout, cw, ch = "strip", width, rps
    if len(offsets) != across * down or len(counts) != across * down:
        raise ValueError("tiff: chunk offset/count arity mismatch")

    if _TAG_MODEL_TRANSFORMATION in t:
        m = t[_TAG_MODEL_TRANSFORMATION]
        if len(m) >= 16 and (m[1] != 0.0 or m[4] != 0.0):
            raise ValueError("tiff: rotated ModelTransformation not supported")
        sx, sy = m[0], -m[5]
        lon0, lat0 = m[3], m[7]
    else:
        scale = t.get(_TAG_MODEL_PIXEL_SCALE)
        tie = t.get(_TAG_MODEL_TIEPOINT)
        if not scale or not tie or len(tie) < 6:
            if parent is None:
                raise ValueError("tiff: no georeferencing (ModelPixelScale+Tiepoint)")
            # overview IFD without geo tags (GDAL keeps geo on IFD 0 only):
            # same outer-corner anchor, pixel size scaled by dimension ratio
            sx = parent["px_lon"] * parent["width"] / width
            sy = parent["px_lat"] * parent["height"] / height
            lon0, lat0 = parent["lon0"], parent["lat0"]
        else:
            sx, sy = scale[0], scale[1]
            # tiepoint: raster (i,j,k) → model (x,y,z); anchor the affine so
            # pixel (0,0)'s OUTER corner is (lon0, lat0)
            lon0 = tie[3] - tie[0] * sx
            lat0 = tie[4] + tie[1] * sy
    nodata = None
    if _TAG_GDAL_NODATA in t:
        try:
            nodata = float(str(t[_TAG_GDAL_NODATA][0]).strip())
        except ValueError:
            nodata = None
    elif parent is not None:
        nodata = parent["nodata"]

    return {
        "width": width, "height": height, "dtype": dtype, "byteorder": bo,
        "compression": comp, "predictor": pred, "layout": layout,
        "bigtiff": big,
        "chunk_width": cw, "chunk_height": ch,
        "chunks_across": across, "chunks_down": down,
        "offsets": [int(o) for o in offsets],
        "counts": [int(c) for c in counts],
        "lon0": float(lon0), "lat0": float(lat0),
        "px_lon": float(sx), "px_lat": float(sy),
        "nodata": nodata,
    }


def tiff_decode_chunk(meta: dict, idx: int, raw: bytes) -> np.ndarray:
    """Decode one strip/tile payload to a 2-D array (rows trimmed to the
    image for the last strip; tiles keep full padded shape — the reader
    trims via the tile's pixel window). ``raw`` is the chunk's byte range."""
    cw, ch = meta["chunk_width"], meta["chunk_height"]
    if meta["layout"] == "strip":
        row0 = idx * ch
        ch = min(ch, meta["height"] - row0)
        if ch <= 0:
            raise ValueError("tiff: strip index beyond image")
    dt = np.dtype(meta["dtype"]).newbyteorder(meta["byteorder"])
    need = cw * ch * dt.itemsize
    if meta["compression"] == 8:
        try:
            raw = zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError(f"tiff: bad deflate stream: {e}") from None
    elif meta["compression"] == 5:
        raw = lzw_decode(raw, max_out=need)
    elif meta["compression"] == 32773:
        raw = packbits_decode(raw, max_out=need)
    if len(raw) < need:
        raise ValueError("tiff: chunk shorter than its pixel window")
    if meta["predictor"] == 3:
        # TIFF TechNote 3 floating-point predictor: per row, undo byte-wise
        # differencing, then gather byte planes (plane 0 = MSB — the wire
        # format is endian-independent; the file byteorder tag only governs
        # the IFD) back into big-endian floats.
        bs = dt.itemsize
        buf = np.frombuffer(raw[:need], dtype=np.uint8).reshape(ch, cw * bs)
        acc = (np.cumsum(buf, axis=1, dtype=np.uint64) & 0xFF).astype(np.uint8)
        planes = np.ascontiguousarray(acc.reshape(ch, bs, cw).transpose(0, 2, 1))
        return planes.reshape(ch, cw * bs).view(
            np.dtype(meta["dtype"]).newbyteorder(">"))
    arr = np.frombuffer(raw[:need], dtype=dt).reshape(ch, cw)
    if meta["predictor"] == 2:
        arr = np.cumsum(arr, axis=1, dtype=arr.dtype)
    return arr


def tiff_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Whole-image decode (tests + small rasters): assemble every chunk."""
    meta = tiff_parse_meta(data)
    w, h = meta["width"], meta["height"]
    out = np.zeros((h, w), dtype=np.dtype(meta["dtype"]))
    cw, ch = meta["chunk_width"], meta["chunk_height"]
    for idx, (off, cnt) in enumerate(zip(meta["offsets"], meta["counts"])):
        if off + cnt > len(data):
            raise ValueError("tiff: chunk byte range beyond EOF")
        a = tiff_decode_chunk(meta, idx, data[off: off + cnt])
        ty, tx = divmod(idx, meta["chunks_across"])
        y0, x0 = ty * ch if meta["layout"] == "tile" else idx * ch, tx * cw
        ys, xs = min(a.shape[0], h - y0), min(cw, w - x0)
        out[y0: y0 + ys, x0: x0 + xs] = a[:ys, :xs]
    return out, meta


def tiff_encode(arr: np.ndarray, lon0: float, lat0: float,
                px_lon: float, px_lat: float, compression: int = 8,
                tile_size: int | None = None, rows_per_strip: int = 64,
                predictor: int = 1, nodata: float | None = None,
                byteorder: str = "<", bigtiff: bool = False,
                overviews: int = 0) -> bytes:
    """Minimal GeoTIFF writer (tests + synthetic population rasters):
    single-band strip or tiled layout, none/LZW/deflate/PackBits, optional
    predictor, ModelPixelScale + ModelTiepoint georeferencing.

    ``overviews`` > 0 appends that many 2×-decimated reduced-resolution
    levels as chained IFDs (NewSubfileType=1 — the cloud-optimized-GeoTIFF
    overview layout; geo tags stay on IFD 0, GDAL-style).

    ``lon0``/``lat0`` are the OUTER top-left corner; ``px_lat`` is positive
    (north-up row step downward)."""
    if arr.ndim != 2:
        raise ValueError("tiff_encode: need a 2-D array")
    h, w = arr.shape
    kind_bits = (arr.dtype.kind, arr.dtype.itemsize * 8)
    sfmt = {"u": 1, "i": 2, "f": 3}.get(kind_bits[0])
    if sfmt is None or (sfmt == 3 and kind_bits[1] != 32) or kind_bits[1] not in (8, 16, 32):
        raise ValueError(f"tiff_encode: unsupported dtype {arr.dtype}")
    if predictor not in (1, 2, 3):
        raise ValueError(f"tiff_encode: predictor {predictor} not supported")
    if predictor == 2 and sfmt == 3:
        raise ValueError("tiff_encode: predictor 2 on float samples (use 3)")
    if predictor == 3 and sfmt != 3:
        raise ValueError("tiff_encode: predictor 3 requires float samples")
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"tiff_encode: compression {compression} not supported")
    dt = arr.dtype.newbyteorder(byteorder)

    def chunk_bytes(a: np.ndarray) -> bytes:
        if predictor == 2:
            a = np.concatenate([a[:, :1], np.diff(a, axis=1)], axis=1).astype(a.dtype)
        if predictor == 3:
            # TechNote 3: split each row's floats into MSB-first byte planes,
            # then byte-wise horizontal differencing (u8 wraparound)
            bs = a.dtype.itemsize
            be = np.ascontiguousarray(a, dtype=a.dtype.newbyteorder(">"))
            be = be.view(np.uint8).reshape(a.shape[0], a.shape[1], bs)
            planes = np.ascontiguousarray(be.transpose(0, 2, 1)).reshape(
                a.shape[0], a.shape[1] * bs)
            diff = planes.copy()
            diff[:, 1:] = planes[:, 1:] - planes[:, :-1]
            raw = diff.tobytes()
        else:
            raw = np.ascontiguousarray(a, dtype=dt).tobytes()
        if compression == 8:
            return zlib.compress(raw, 6)
        if compression == 5:
            return lzw_encode(raw)
        if compression == 32773:
            return packbits_encode(raw)
        return raw

    levels = [arr]
    for _ in range(max(overviews, 0)):
        prev = levels[-1]
        if min(prev.shape) < 2:
            break
        # nearest (top-left) decimation: dtype-exact and deterministic (the
        # GDAL "nearest" overview resampler); averaging would change dtype
        levels.append(prev[::2, ::2])

    def make_chunks(a: np.ndarray) -> list[bytes]:
        hh, ww = a.shape
        out: list[bytes] = []
        if tile_size:
            if tile_size % 16:
                raise ValueError("tiff_encode: tile size must be a multiple of 16")
            for ty in range((hh + tile_size - 1) // tile_size):
                for tx in range((ww + tile_size - 1) // tile_size):
                    tile = np.zeros((tile_size, tile_size), dtype=a.dtype)
                    src = a[ty * tile_size: (ty + 1) * tile_size,
                            tx * tile_size: (tx + 1) * tile_size]
                    tile[: src.shape[0], : src.shape[1]] = src
                    out.append(chunk_bytes(tile))
        else:
            for r0 in range(0, hh, rows_per_strip):
                out.append(chunk_bytes(a[r0: r0 + rows_per_strip]))
        return out

    bo = byteorder
    off_ftype = 16 if bigtiff else 4  # LONG8 offsets: the point of BigTIFF

    def make_entries(a: np.ndarray, chunks: list[bytes],
                     level0: bool) -> list[tuple[int, int, int, list]]:
        hh, ww = a.shape
        entries: list[tuple[int, int, int, list]] = []

        def add(tag, ftype, vals):
            entries.append((tag, ftype, len(vals), list(vals)))

        if not level0:
            add(254, 4, [1])  # NewSubfileType: reduced-resolution overview
        add(_TAG_WIDTH, 4, [ww])
        add(_TAG_LENGTH, 4, [hh])
        add(_TAG_BITS, 3, [kind_bits[1]])
        add(_TAG_COMPRESSION, 3, [compression])
        add(_TAG_PHOTOMETRIC, 3, [1])
        add(_TAG_SAMPLES_PER_PIXEL, 3, [1])
        if tile_size:
            add(_TAG_TILE_WIDTH, 3, [tile_size])
            add(_TAG_TILE_LENGTH, 3, [tile_size])
            add(_TAG_TILE_OFFSETS, off_ftype, [0] * len(chunks))   # patched below
            add(_TAG_TILE_COUNTS, 4, [len(c) for c in chunks])
        else:
            add(_TAG_ROWS_PER_STRIP, 3, [rows_per_strip])
            add(_TAG_STRIP_OFFSETS, off_ftype, [0] * len(chunks))  # patched below
            add(_TAG_STRIP_COUNTS, 4, [len(c) for c in chunks])
        if predictor != 1:
            add(_TAG_PREDICTOR, 3, [predictor])
        add(_TAG_SAMPLE_FORMAT, 3, [sfmt])
        if level0:  # GDAL convention: geo + nodata live on IFD 0 only
            add(_TAG_MODEL_PIXEL_SCALE, 12, [px_lon, px_lat, 0.0])
            add(_TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, lon0, lat0, 0.0])
            if nodata is not None:
                nd = (f"{nodata:.10g}").encode() + b"\x00"
                entries.append((_TAG_GDAL_NODATA, 2, len(nd), [nd]))
        entries.sort(key=lambda e: e[0])
        return entries

    level_chunks = [make_chunks(a) for a in levels]
    level_entries = [make_entries(a, c, li == 0)
                     for li, (a, c) in enumerate(zip(levels, level_chunks))]

    # layout: header | [IFD_i | out-of-line values_i]... | all pixel chunks.
    # Overview IFDs chain through the next-IFD pointer (COG layout).
    # BigTIFF (magic 43): u64 IFD offset, u64 entry count, 20-byte entries
    # with u64 counts and 8-byte inline values, u64 next-IFD pointer.
    hdr_sz, cnt_sz, ent_sz, ptr_sz = (16, 8, 20, 8) if bigtiff else (8, 2, 12, 4)
    inline_max, ofmt, cfmt = (8, "Q", "Q") if bigtiff else (4, "I", "I")
    pos = hdr_sz
    ifd_offs: list[int] = []
    packed_levels = []
    for entries in level_entries:
        ifd_offs.append(pos)
        pos += cnt_sz + ent_sz * len(entries) + ptr_sz
        value_blobs: list[bytes] = []
        packed: list[tuple[int, int, int, bytes | None, int]] = []
        for tag, ftype, count, vals in entries:
            fmt, size = _TYPES[ftype]
            if ftype == 2:
                blob = vals[0]
            elif ftype in (5, 10):
                blob = b""  # not emitted by this writer
            else:
                blob = struct.pack(bo + fmt * count, *vals)
            if len(blob) <= inline_max:
                packed.append((tag, ftype, count, blob.ljust(inline_max, b"\x00"), -1))
            else:
                packed.append((tag, ftype, count, None, pos))
                value_blobs.append(blob)
                pos += len(blob)
        packed_levels.append((packed, value_blobs))
    level_offs: list[list[int]] = []
    for chunks in level_chunks:
        offs = []
        for c in chunks:
            offs.append(pos)
            pos += len(c)
        level_offs.append(offs)

    off_tag = _TAG_TILE_OFFSETS if tile_size else _TAG_STRIP_OFFSETS
    off_blob_fmt = "Q" if bigtiff else "I"
    out = bytearray()
    out += b"II" if bo == "<" else b"MM"
    if bigtiff:
        out += struct.pack(bo + "HHHQ", 43, 8, 0, 16)
    else:
        out += struct.pack(bo + "HI", 42, 8)
    for li, ((packed, value_blobs), offs) in enumerate(zip(packed_levels, level_offs)):
        out += struct.pack(bo + ("Q" if bigtiff else "H"), len(packed))
        for tag, ftype, count, inline, voff in packed:
            out += struct.pack(bo + "HH" + cfmt, tag, ftype, count)
            if inline is not None:
                if tag == off_tag:  # single chunk, inline offset
                    inline = struct.pack(bo + off_blob_fmt, offs[0]).ljust(
                        inline_max, b"\x00")
                out += inline
            else:
                out += struct.pack(bo + ofmt, voff)
        nxt = ifd_offs[li + 1] if li + 1 < len(ifd_offs) else 0
        out += struct.pack(bo + ofmt, nxt)
        blob_i = 0
        for tag, ftype, count, inline, voff in packed:
            if inline is None:
                blob = value_blobs[blob_i]
                blob_i += 1
                if tag == off_tag:
                    blob = struct.pack(bo + off_blob_fmt * len(offs), *offs)
                out += blob
    for chunks in level_chunks:
        for c in chunks:
            out += c
    return bytes(out)
