"""Pure-stdlib PNG codec (zlib + struct) for the multimodal operators.

The container ships no image libraries, but PNG's baseline format needs
only zlib: a decoder is chunk parsing + inflate + per-scanline
un-filtering, and an encoder is the reverse with filter type 0.  This
makes the image path of :mod:`..operators.multimodal` real end-to-end —
real encoded bytes in the ``content`` column, real decode on the
executors — with zero new dependencies.

Supported: 8-bit greyscale (color type 0) and 8-bit RGB (color type 2),
non-interlaced — the baseline produced by every mainstream encoder for
such images.  All five baseline filter types (None/Sub/Up/Average/
Paeth) are decoded; encoding always uses filter 0 (valid per spec —
filter choice is a compression heuristic, not a format requirement).

Public spec: PNG (Portable Network Graphics) Specification, W3C/ISO
(RFC 2083).  No reference-repo counterpart — the reference has no
media handling at all.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a ``(h, w)`` greyscale or ``(h, w, 3)`` RGB uint8 array as
    a non-interlaced 8-bit PNG (filter 0 on every scanline)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        color_type, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = a.reshape(h, w * channels)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scanlines))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode a baseline PNG to a ``(h, w)`` (greyscale) or ``(h, w, 3)``
    (RGB) uint8 array.  Raises ValueError on non-PNG bytes or PNG
    features outside the supported baseline (palette, alpha, 16-bit,
    interlace)."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}, "
            f"interlace={interlace}); baseline grey/RGB 8-bit only")
    channels = 1 if color_type == 0 else 3
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1).copy()
        if ftype == 0:          # None
            cur = line
        elif ftype == 2:        # Up
            cur = line + prev   # uint8 wraparound == mod-256 per spec
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth need the reconstructed left neighbor —
            # sequential in x by definition (bpp-strided scan)
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                if ftype == 1:      # Sub
                    cur[x] = (int(cur[x]) + left) & 0xFF
                elif ftype == 3:    # Average
                    cur[x] = (int(cur[x]) + ((left + up) >> 1)) & 0xFF
                else:               # Paeth
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)
