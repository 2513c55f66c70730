"""Pure-stdlib WAV (RIFF / PCM16) codec — no audio library required.

Same doctrine as :mod:`.png`: the container formats whose byte layout
is fully public and compression-free are implemented for real, so the
multimodal audio path runs on genuine encoded bytes end-to-end; only
codecs that need native decoders (MP3/AAC/Opus) remain behind the
documented fake boundary.

Format written/read: canonical 44-byte RIFF header, ``fmt `` chunk of
16 bytes with ``audio_format=1`` (uncompressed PCM), 16-bit
little-endian samples, interleaved channels.  ``decode_wav`` tolerates
extra chunks (LIST/fact/cue) by walking the chunk list, which is what
real-world WAV files require.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, channels) — to WAV
    bytes."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    arr = arr.astype("<i2")
    n, channels = arr.shape
    data = arr.tobytes()
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                   sample_rate, byte_rate, block_align, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes → (int16 array of shape (n, channels),
    sample_rate).  Raises ValueError on non-RIFF input or non-PCM16
    encodings."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported encoding (format={audio_format}, "
                         f"bits={bits}); only PCM16 is implemented")
    if channels < 1:
        raise ValueError("fmt chunk declares 0 channels")
    n = len(raw) // (2 * channels)
    arr = np.frombuffer(raw[:n * 2 * channels], dtype="<i2") \
        .reshape(n, channels)
    return arr, sample_rate
