"""WKB (Well-Known Binary) codec over numpy coordinate arrays.

Replaces the shapely geometry-object column of the reference
(``/root/reference/src/geopull/blocker.py:56`` geometry objects everywhere)
with plain ``bytes`` columns; decode happens only inside kernel batches.

Geometry model (plain tuples, numpy payloads):

    ("Point",            ndarray shape (2,))
    ("LineString",       ndarray shape (n, 2))
    ("Polygon",          [ring0, ring1, ...])      rings are (n, 2) closed
    ("MultiPoint",       [pt, ...])
    ("MultiLineString",  [ls, ...])
    ("MultiPolygon",     [[rings...], ...])
    ("GeometryCollection", [geom, ...])            geom = full tuples

Only 2-D little-endian WKB is produced; both endiannesses are parsed.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_CODES = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_CODE_TYPES = {v: k for k, v in _TYPE_CODES.items()}


class WKBError(ValueError):
    pass


_EWKB_SRID = 0x20000000
_EWKB_ZM = 0x80000000 | 0x40000000  # Z | M dimension flags


def _read_header(buf: bytes, pos: int) -> tuple[str, str, int]:
    byte_order = buf[pos]
    endian = "<" if byte_order == 1 else ">"
    (code,) = struct.unpack_from(endian + "I", buf, pos + 1)
    pos += 5
    # EWKB: high bits flag extra dims / an SRID payload. Z/M coordinates
    # would silently misparse the coord stream → reject explicitly; an SRID
    # flag just means 4 extra header bytes to skip (ADVICE r1: previously the
    # flag was masked but the payload not skipped — garbage coordinates).
    if code & _EWKB_ZM:
        raise WKBError(f"EWKB Z/M geometry not supported (code {code:#x})")
    if code & _EWKB_SRID:
        pos += 4  # skip the SRID value; coordinates are 2-D and parse fine
        code &= ~_EWKB_SRID
    if code >= 1000:  # ISO 1001+/2001+/3001+ are Z/M/ZM variants
        raise WKBError(f"ISO WKB Z/M geometry not supported (code {code})")
    gtype = _CODE_TYPES.get(code)
    if gtype is None:
        raise WKBError(f"unsupported WKB type code {code}")
    return gtype, endian, pos


def _parse(buf: bytes, pos: int):
    gtype, e, pos = _read_header(buf, pos)
    if gtype == "Point":
        xy = np.frombuffer(buf, dtype=e + "f8", count=2, offset=pos)
        return (gtype, np.asarray(xy, dtype=np.float64)), pos + 16
    if gtype == "LineString":
        (n,) = struct.unpack_from(e + "I", buf, pos)
        pos += 4
        coords = np.frombuffer(buf, dtype=e + "f8", count=2 * n, offset=pos)
        coords = np.asarray(coords, dtype=np.float64).reshape(n, 2)
        return (gtype, coords), pos + 16 * n
    if gtype == "Polygon":
        (nrings,) = struct.unpack_from(e + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(e + "I", buf, pos)
            pos += 4
            ring = np.frombuffer(buf, dtype=e + "f8", count=2 * n, offset=pos)
            rings.append(np.asarray(ring, dtype=np.float64).reshape(n, 2))
            pos += 16 * n
        return (gtype, rings), pos
    # multi / collection: children are full WKB geometries
    (nparts,) = struct.unpack_from(e + "I", buf, pos)
    pos += 4
    parts = []
    for _ in range(nparts):
        child, pos = _parse(buf, pos)
        parts.append(child)
    if gtype == "GeometryCollection":
        return (gtype, parts), pos
    # strip child wrappers down to payloads for Multi* convenience
    payload = [c[1] for c in parts]
    return (gtype, payload), pos


def loads(buf: bytes):
    """Parse a WKB buffer into the tuple geometry model."""
    if buf is None:
        return None
    geom, _ = _parse(bytes(buf), 0)
    return geom


def _dump(geom, out: list) -> None:
    gtype, payload = geom
    out.append(b"\x01")
    out.append(struct.pack("<I", _TYPE_CODES[gtype]))
    if gtype == "Point":
        out.append(np.asarray(payload, dtype="<f8").tobytes())
    elif gtype == "LineString":
        arr = np.asarray(payload, dtype="<f8")
        out.append(struct.pack("<I", arr.shape[0]))
        out.append(arr.tobytes())
    elif gtype == "Polygon":
        out.append(struct.pack("<I", len(payload)))
        for ring in payload:
            arr = np.asarray(ring, dtype="<f8")
            out.append(struct.pack("<I", arr.shape[0]))
            out.append(arr.tobytes())
    elif gtype == "GeometryCollection":
        out.append(struct.pack("<I", len(payload)))
        for child in payload:
            _dump(child, out)
    else:  # Multi*
        child_type = gtype[5:]  # MultiPoint -> Point etc.
        out.append(struct.pack("<I", len(payload)))
        for child_payload in payload:
            _dump((child_type, child_payload), out)


def dumps(geom) -> bytes:
    """Serialize the tuple geometry model to little-endian WKB."""
    out: list = []
    _dump(geom, out)
    return b"".join(out)


def geom_type(geom) -> str:
    return geom[0]


def get_parts(geom) -> list:
    """Explode Multi*/collection into single geometries (reference F4/F12,
    ``blocker.py:55``, ``blocker.py:118``)."""
    gtype, payload = geom
    if gtype == "GeometryCollection":
        parts = []
        for child in payload:
            parts.extend(get_parts(child))
        return parts
    if gtype.startswith("Multi"):
        child_type = gtype[5:]
        return [(child_type, p) for p in payload]
    return [geom]


def bounds(geom) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) over all coordinates."""
    arrs = _coord_arrays(geom)
    if not arrs:
        return (np.nan, np.nan, np.nan, np.nan)
    allc = np.vstack(arrs)
    mn = allc.min(axis=0)
    mx = allc.max(axis=0)
    return (float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1]))


def _coord_arrays(geom) -> list[np.ndarray]:
    gtype, payload = geom
    if gtype == "Point":
        return [np.asarray(payload, dtype=np.float64).reshape(1, 2)]
    if gtype == "LineString":
        return [np.asarray(payload)]
    if gtype == "Polygon":
        return [np.asarray(r) for r in payload]
    if gtype == "GeometryCollection":
        out = []
        for child in payload:
            out.extend(_coord_arrays(child))
        return out
    child_type = gtype[5:]
    out = []
    for p in payload:
        out.extend(_coord_arrays((child_type, p)))
    return out


def point(x: float, y: float) -> bytes:
    return dumps(("Point", np.array([x, y], dtype=np.float64)))


def linestring(coords) -> bytes:
    return dumps(("LineString", np.asarray(coords, dtype=np.float64)))


def polygon(exterior, holes=()) -> bytes:
    rings = [_close_ring(np.asarray(exterior, dtype=np.float64))]
    rings.extend(_close_ring(np.asarray(h, dtype=np.float64)) for h in holes)
    return dumps(("Polygon", rings))


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring
