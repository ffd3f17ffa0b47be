"""Pure-stdlib WAV (RIFF PCM) codec — activates the REAL audio-decode path
of the multimodal operators (the image analogue is png_codec).

Decoder: 8-bit unsigned / 16-bit / 32-bit signed PCM, any channel count
(channels are averaged to mono float64 in [-1, 1]). Uses the stdlib
``wave`` module for RIFF framing — no third-party audio libs. Encoder:
16-bit PCM writer for deterministic test fixtures and synthetic media
tables. Compressed codecs (mp3/aac/ogg) stay behind the documented
NotImplementedError seam.
"""

from __future__ import annotations

import io
import wave

import numpy as np

RIFF_MAGIC = b"RIFF"


def is_wav(payload: bytes | None) -> bool:
    return (
        bool(payload) and len(payload) > 12
        and payload[:4] == RIFF_MAGIC and payload[8:12] == b"WAVE"
    )


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float64 samples in [-1, 1], sample_rate).

    Raises ValueError on non-WAV or unsupported sample widths so callers
    can fall through to another decoder or the seam error.
    """
    if not is_wav(payload):
        raise ValueError("not a WAV payload (bad RIFF magic)")
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            n_ch, width, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV structure: {e}") from e
    if width == 1:  # 8-bit PCM is unsigned per spec
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} (1/2/4 bytes only)")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono float array in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).round().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm16.tobytes())
    return buf.getvalue()


def block_rms_features(samples: np.ndarray, feature_dim: int = 16) -> np.ndarray:
    """Deterministic audio features: RMS energy over feature_dim equal
    time blocks (the audio analogue of png block-mean resize)."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) == 0:
        return np.zeros(feature_dim, dtype=np.float32)
    bins = (np.arange(len(x)) * feature_dim) // len(x)
    sq_sum = np.bincount(bins, weights=x * x, minlength=feature_dim)
    cnt = np.bincount(bins, minlength=feature_dim)
    return np.sqrt(sq_sum / np.maximum(cnt, 1)).astype(np.float32)
