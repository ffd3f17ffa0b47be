"""Pure-stdlib YUV4MPEG2 (.y4m) video codec — the video analogue of
png_codec/wav_codec: a REAL decode path for the multimodal seam with zero
third-party dependencies.

YUV4MPEG2 is the classic uncompressed interchange format (mjpegtools /
ffmpeg ``-f yuv4mpegpipe``): an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A1:1] [C<colorspace>]\\n``
followed by frames, each ``FRAME[ params]\\n`` plus raw planar pixel
data. Supported colorspaces here: ``mono`` (Y only), ``420``/``420jpeg``/
``420mpeg2``/``420paldv`` (Y + 2 quarter-size chroma planes) and ``444``;
decode always returns the luma plane (features downstream are grayscale
anyway — same contract as png_codec.to_grayscale).

Raises ValueError on malformed payloads / unsupported colorspaces so the
multimodal decode seam can surface its documented NotImplementedError.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "

# supported colorspaces -> chroma plane geometry. 420 chroma planes are
# ceil-half in EACH dimension (2 * ceil(w/2) * ceil(h/2) bytes total), so
# odd-dimension 420 streams stride correctly — luma/2 is only right for
# even w AND h (ADVICE r5).
_420_SPACES = frozenset({"420", "420jpeg", "420mpeg2", "420paldv"})
_COLORSPACES = _420_SPACES | {"mono", "444"}


def _chroma_bytes(width: int, height: int, colorspace: str) -> int:
    if colorspace == "mono":
        return 0
    if colorspace == "444":
        return 2 * width * height
    return 2 * ((width + 1) // 2) * ((height + 1) // 2)


def is_y4m(payload: bytes | None) -> bool:
    return bool(payload) and payload[: len(Y4M_MAGIC)] == Y4M_MAGIC


def _parse_header(payload: bytes) -> tuple[dict, int]:
    """Stream-header params + offset of the first FRAME marker."""
    if not is_y4m(payload):
        raise ValueError("not a YUV4MPEG2 payload (bad magic)")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated YUV4MPEG2 stream header")
    params: dict = {"colorspace": "420jpeg", "fps": (30, 1)}  # spec defaults
    for tok in payload[len(Y4M_MAGIC): nl].split(b" "):
        if not tok:
            continue
        key, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if key == "W":
            params["width"] = int(val)
        elif key == "H":
            params["height"] = int(val)
        elif key == "F":
            num, den = val.split(":")
            params["fps"] = (int(num), int(den))
        elif key == "C":
            params["colorspace"] = val
        # I (interlacing), A (aspect), X (extensions) don't affect decode
    if "width" not in params or "height" not in params:
        raise ValueError("YUV4MPEG2 header missing W or H")
    if params["colorspace"] not in _COLORSPACES:
        raise ValueError(
            f"unsupported YUV4MPEG2 colorspace C{params['colorspace']}")
    return params, nl + 1


def _frame_bytes(params: dict) -> int:
    w, h = params["width"], params["height"]
    return w * h + _chroma_bytes(w, h, params["colorspace"])


def y4m_decode(payload: bytes, frame_indexes: list[int] | None = None
               ) -> tuple[list[np.ndarray], dict]:
    """Decode luma planes -> (frames, params). ``frame_indexes`` limits the
    decode to those frames (still one linear scan — frames are
    variable-offset because FRAME lines may carry params); params gains
    ``n_frames`` with the TOTAL frame count either way."""
    params, off = _parse_header(payload)
    w, h = params["width"], params["height"]
    fsize = _frame_bytes(params)
    wanted = None if frame_indexes is None else set(frame_indexes)
    frames: dict[int, np.ndarray] = {}
    idx = 0
    while off < len(payload):
        if payload[off: off + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {off}")
        nl = payload.find(b"\n", off)
        if nl < 0 or nl + 1 + fsize > len(payload):
            raise ValueError(f"truncated frame {idx}")
        if wanted is None or idx in wanted:
            luma = np.frombuffer(
                payload, dtype=np.uint8, count=w * h, offset=nl + 1
            ).reshape(h, w)
            frames[idx] = luma
        off = nl + 1 + fsize
        idx += 1
    params = dict(params, n_frames=idx)
    order = sorted(frames) if frame_indexes is None else [
        i for i in frame_indexes if i in frames]
    return [frames[i] for i in order], params


def y4m_frame_count(payload: bytes) -> tuple[int, dict]:
    """Total frame count + params without copying pixel data (one linear
    scan over the FRAME markers)."""
    frames, params = y4m_decode(payload, frame_indexes=[])
    return params["n_frames"], params


def y4m_encode(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1),
               colorspace: str = "mono") -> bytes:
    """Encode grayscale (H, W) uint8 frames as YUV4MPEG2. ``mono`` writes
    the luma plane only; ``420*``/``444`` pad flat gray chroma (128) so any
    standard player accepts the stream."""
    if not frames:
        raise ValueError("need at least one frame")
    if colorspace not in _COLORSPACES:
        raise ValueError(f"unsupported colorspace {colorspace}")
    h, w = frames[0].shape
    chroma = b"\x80" * _chroma_bytes(w, h, colorspace)
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    out = [head.encode("ascii")]
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(fr, dtype=np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)


def frame_features(luma: np.ndarray, feature_dim: int = 16) -> np.ndarray:
    """Same grayscale feature contract as the image path: block-mean
    resize to (feature_dim, feature_dim), row means."""
    from cardinality_estimation_evaluation_framework_spark.functions import (
        png_codec,
    )

    grid = png_codec.block_mean_resize(luma.astype(np.float64), feature_dim,
                                       feature_dim)
    return grid.mean(axis=1).astype(np.float32)
