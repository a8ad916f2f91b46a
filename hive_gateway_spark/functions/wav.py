"""RIFF/WAVE PCM codec — the audio leg of the multimodal family.

Like PPM/BMP for images, uncompressed PCM WAV is stdlib-decodable, so
the audio plumbing ships with a REAL codec instead of a stub: RIFF
chunk walk, fmt parse, PCM extraction (16-bit signed LE / 8-bit
unsigned-offset). Compressed format tags (µ-law, ADPCM, MP3-in-WAV)
raise NotImplementedError — the honest boundary, routed via
DECODE_ERRORS like every decode kernel; a production build swaps in
libsndfile at the single `wav_decode` seam.

Reference scope note: the reference gateway (src/gateway.ts) has no
media layer at all — this exists for the LLM-pipeline mandate (opaque
binary columns + typed metadata + real decode where the container
allows it).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["wav_decode", "wav_encode"]

#: WAVE format tags (RIFF spec): 1 = integer PCM.
_WAVE_FORMAT_PCM = 1


def wav_encode(
    samples: "np.ndarray", sample_rate: int = 8000, sample_width: int = 2
) -> bytes:
    """PCM WAV bytes from an (n_samples,) or (n_samples, n_channels)
    integer array. sample_width 2 → 16-bit signed LE; 1 → 8-bit with
    the +128 unsigned offset (values must be in the signed 8-bit
    range)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if sample_width == 2:
        data = arr.astype("<i2").tobytes()
    elif sample_width == 1:
        data = (arr.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"sample_width must be 1 or 2, got {sample_width}")
    byte_rate = sample_rate * ch * sample_width
    fmt = struct.pack(
        "<HHIIHH",
        _WAVE_FORMAT_PCM,
        ch,
        sample_rate,
        byte_rate,
        ch * sample_width,
        8 * sample_width,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> dict:
    """PCM WAV → {sample_rate, n_channels, sample_width, n_samples,
    pcm: (n, ch) int16/int8-domain array}. 8-bit samples are returned
    re-centered ((u8 − 128), exact). Malformed containers raise
    ValueError; non-PCM format tags raise NotImplementedError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", chunk)
        elif tag == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    ftag, ch, rate, _brate, _align, bits = fmt
    if ftag != _WAVE_FORMAT_PCM:
        raise NotImplementedError(f"non-PCM WAV format tag {ftag}")
    if bits == 16:
        pcm = np.frombuffer(data, "<i2").astype(np.int16)
        width = 2
    elif bits == 8:
        pcm = (np.frombuffer(data, np.uint8).astype(np.int16) - 128).astype(np.int16)
        width = 1
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if ch <= 0 or len(pcm) % ch:
        raise ValueError("PCM length not divisible by channel count")
    pcm = pcm.reshape(-1, ch)
    return {
        "sample_rate": rate,
        "n_channels": ch,
        "sample_width": width,
        "n_samples": pcm.shape[0],
        "pcm": pcm,
    }
