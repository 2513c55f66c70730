"""Pure-stdlib YUV4MPEG2 (.y4m) codec — no video library required.

Completes the real-codec triad next to :mod:`.png` (image) and
:mod:`.wav` (audio): Y4M is THE uncompressed video interchange format
(what ffmpeg/x264 pipe between stages) and its layout is fully public —
an ASCII stream header (``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``)
followed by per-frame ``FRAME\\n`` markers with raw planar YUV bytes.
Only formats that need a real entropy decoder (H.264/VP9/AV1) stay
behind the documented fake boundary.

Implemented colorspaces: ``C420`` family (4:2:0 — frame size
w*h*3/2) and ``Cmono`` (luma only — w*h), which covers what the
format's own tooling emits by default.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               mono: bool = True) -> bytes:
    """Encode frames — uint8 array of shape (n, h, w) — to mono Y4M
    bytes (``Cmono``: one luma plane per frame; chroma-free, exact)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError("frames must be (n, h, w) uint8")
    if not mono:
        raise ValueError("only Cmono encoding is implemented")
    n, h, w = arr.shape
    head = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
            .encode("ascii"))
    parts = [head]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(arr[i].tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode Y4M bytes → (luma frames of shape (n, h, w) uint8, fps).

    For ``C420*`` streams the chroma planes are parsed (to advance
    correctly) and discarded — the luma plane is what frame-level
    feature extraction consumes.  Raises ValueError on malformed
    streams or unimplemented colorspaces.
    """
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = "C420"
    for tok in data[len(_MAGIC):nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = (int(num), int(den))
        elif t[0] == "C":
            cs = t
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    if cs.startswith("C420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == "Cmono":
        frame_bytes = w * h
    else:
        raise ValueError(f"unsupported colorspace {cs}; only C420*/Cmono "
                         "are implemented")
    pos, frames = nl + 1, []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        pos = fnl + 1
        raw = data[pos:pos + frame_bytes]
        if len(raw) < frame_bytes:
            raise ValueError("truncated frame payload")
        frames.append(np.frombuffer(raw[:w * h], dtype=np.uint8)
                      .reshape(h, w))
        pos += frame_bytes
    return (np.stack(frames) if frames
            else np.zeros((0, h, w), np.uint8)), fps
