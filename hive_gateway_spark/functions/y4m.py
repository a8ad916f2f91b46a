"""YUV4MPEG2 (.y4m) codec — the video leg of the multimodal family.

Y4M is the public raw-video interchange container (mjpegtools spec;
what ffmpeg/x264 read and write for uncompressed streams): one ASCII
stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den> ...\\n`` followed by
``FRAME...\\n`` markers each carrying planar YUV data. Because the
payload is raw planes, the full container decodes in pure numpy — so
like PPM/BMP (images) and PCM WAV (audio), the video plumbing ships
with a REAL codec rather than a stub.

Supported colourspaces: ``C420jpeg``/``C420`` (chroma quartered),
``C444`` (full chroma) and ``Cmono`` (luma only). Interlaced streams
(``It``/``Ib``/``Im``) and other chroma taggings raise
NotImplementedError — the honest boundary, routed via DECODE_ERRORS
like every decode kernel; a production build swaps in ffmpeg/libav at
the single ``y4m_decode`` seam for compressed codecs (H.264, VP9, AV1).

Reference scope note: the reference gateway (src/gateway.ts) has no
media layer — this exists for the LLM-pipeline mandate (opaque binary
columns + typed metadata + real frame-sampling where the container
allows it).
"""

from __future__ import annotations

import numpy as np

__all__ = ["y4m_decode", "y4m_encode"]

_MAGIC = b"YUV4MPEG2"

#: colourspace tag → (chroma width divisor, chroma height divisor);
#: None = no chroma planes.
_CHROMA = {
    "420jpeg": (2, 2),
    "420": (2, 2),
    "444": (1, 1),
    "mono": None,
}


def y4m_encode(
    y: "np.ndarray",
    u: "np.ndarray | None" = None,
    v: "np.ndarray | None" = None,
    fps: tuple[int, int] = (25, 1),
    colourspace: str = "420jpeg",
) -> bytes:
    """Y4M bytes from planar frame arrays.

    ``y`` is (n_frames, h, w) uint8; for chroma colourspaces ``u``/``v``
    are (n_frames, h//dy, w//dx) uint8; for ``mono`` they must be None.
    """
    y = np.asarray(y, dtype=np.uint8)
    n, h, w = y.shape
    sub = _CHROMA[colourspace]
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colourspace}\n"
    out = [head.encode("ascii")]
    if sub is None:
        if u is not None or v is not None:
            raise ValueError("mono streams carry no chroma planes")
        for f in range(n):
            out.append(b"FRAME\n")
            out.append(y[f].tobytes())
    else:
        dx, dy = sub
        u = np.asarray(u, dtype=np.uint8)
        v = np.asarray(v, dtype=np.uint8)
        if u.shape != (n, h // dy, w // dx) or v.shape != u.shape:
            raise ValueError(
                f"chroma shape {u.shape} != expected {(n, h // dy, w // dx)}"
            )
        for f in range(n):
            out.append(b"FRAME\n")
            out.append(y[f].tobytes())
            out.append(u[f].tobytes())
            out.append(v[f].tobytes())
    return b"".join(out)


def _parse_params(tokens: list[str]) -> dict:
    params: dict[str, str] = {}
    for tok in tokens:
        if not tok:
            continue
        params[tok[0]] = tok[1:]
    return params


def y4m_decode(payload: bytes) -> dict:
    """Parse a Y4M stream → dict(width, height, fps, colourspace,
    n_frames, y, u, v) with ``y`` (n, h, w) uint8 and ``u``/``v``
    (n, ch, cw) uint8 or None for mono. Raises ValueError on a
    malformed container, NotImplementedError on honest boundaries
    (interlaced streams, unsupported chroma taggings)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    tokens = payload[len(_MAGIC) + 1 : nl].decode("ascii", "replace").split(" ")
    params = _parse_params(tokens)
    try:
        w, h = int(params["W"]), int(params["H"])
    except (KeyError, ValueError):
        raise ValueError("Y4M header missing W/H")
    num, _, den = params.get("F", "25:1").partition(":")
    fps = (int(num), int(den or "1"))
    if params.get("I", "p") not in ("p", "?"):
        raise NotImplementedError(f"interlaced Y4M (I{params['I']}) not supported")
    cs = params.get("C", "420jpeg")
    if cs not in _CHROMA:
        raise NotImplementedError(f"Y4M colourspace C{cs} not supported")
    sub = _CHROMA[cs]
    if w <= 0 or h <= 0:
        raise ValueError(f"bad Y4M geometry {w}x{h}")
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(f"geometry {w}x{h} not divisible for C{cs} chroma")

    ysz = w * h
    if sub is None:
        csz, cw, ch = 0, 0, 0
    else:
        cw, ch = w // sub[0], h // sub[1]
        csz = cw * ch
    frame_bytes = ysz + 2 * csz

    ys, us, vs = [], [], []
    pos = nl + 1
    end = len(payload)
    while pos < end:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload.startswith(b"FRAME", pos):
            raise ValueError(f"bad FRAME marker at offset {pos}")
        ftokens = payload[pos + 5 : fnl].decode("ascii", "replace").split(" ")
        # frame-level params are legal (the X extension escape); any
        # I/C override at frame level is out of scope for raw planes
        fparams = _parse_params(ftokens)
        if "I" in fparams or "C" in fparams:
            raise NotImplementedError("per-frame I/C overrides not supported")
        data_at = fnl + 1
        if data_at + frame_bytes > end:
            raise ValueError("truncated Y4M frame payload")
        buf = np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=data_at)
        ys.append(buf[:ysz].reshape(h, w))
        if sub is not None:
            us.append(buf[ysz : ysz + csz].reshape(ch, cw))
            vs.append(buf[ysz + csz :].reshape(ch, cw))
        pos = data_at + frame_bytes
    y = np.stack(ys) if ys else np.empty((0, h, w), dtype=np.uint8)
    return {
        "width": w,
        "height": h,
        "fps": fps,
        "colourspace": cs,
        "n_frames": len(ys),
        "y": y,
        "u": np.stack(us) if us else None,
        "v": np.stack(vs) if vs else None,
    }
