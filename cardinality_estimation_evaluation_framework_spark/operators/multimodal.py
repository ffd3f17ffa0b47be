"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct
(modality, width/height or sample_rate, codec). The Spark-side plumbing —
schema, partition sizing, Arrow batch shapes, mapInPandas signatures — is
real and tested, and every modality has a REAL pure-stdlib decode path:
PNG via functions/png_codec, WAV/PCM via functions/wav_codec, YUV4MPEG2
video via functions/y4m_codec (PIL is used for images when importable).
Compressed formats beyond those (JPEG, MP3, H.264...) raise the
documented NotImplementedError seam — swap a codec-equipped decoder in
on a cluster image that ships the libs. ``fake=True`` keeps the old
deterministic byte-derived features so plumbing is testable with
arbitrary payloads.

Batch-size note (100 TB posture): binary payloads dominate Arrow batch
memory, so the reader caps ``maxRecordsPerBatch`` via bytes_per_batch /
payload estimate rather than row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("codec", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def synthesize_media_df(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Derive a deterministic fake media table from the documents table
    (payload = utf-8 bytes of the text) so plumbing is testable without
    binary fixtures."""
    return docs.select(
        F.concat(F.lit(f"{modality}_"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit("fake").alias("codec"),
    )


def pil_or_none():
    """PIL.Image when the imaging lib is installed, else None — the same
    import-gate pattern as hashing.farmhash_or_none."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def decode_image_real(payload: bytes, feature_dim: int = 16) -> np.ndarray:
    """REAL image decode: decode -> grayscale -> resize to a feature_dim x
    feature_dim grid -> row means as the feature vector.

    Real decoders, in preference order:
    - PIL when importable (all formats; bicubic resize), or
    - the pure-stdlib PNG codec (functions/png_codec.py: zlib inflate +
      scanline unfilter per the PNG spec) for PNG payloads, or
    - the pure-stdlib baseline JPEG codec (functions/jpeg_codec.py:
      Huffman + dequant + IDCT + chroma upsample per T.81) for JPEG
      payloads — so the real path covers the two dominant crawl image
      formats even on codec-less images. Deterministic either way;
      pinned by golden-fixture tests in tests/test_io_and_misc.py (the
      stdlib paths run everywhere; the PIL path is skipif-gated).
    """
    from cardinality_estimation_evaluation_framework_spark.functions import (
        jpeg_codec,
        png_codec,
    )

    pil = pil_or_none()
    if pil is not None:
        import io

        img = pil.open(io.BytesIO(payload)).convert("L")
        grid = np.asarray(
            img.resize((feature_dim, feature_dim)), dtype=np.float64
        )
        return grid.mean(axis=1).astype(np.float32)
    if jpeg_codec.is_jpeg(payload):
        arr = jpeg_codec.jpeg_decode(payload)
    else:
        arr = png_codec.png_decode(payload)  # ValueError on non-PNG
    gray = png_codec.to_grayscale(arr)
    grid = png_codec.block_mean_resize(gray, feature_dim, feature_dim)
    return grid.mean(axis=1).astype(np.float32)


def decode_audio_real(payload: bytes, feature_dim: int = 16) -> np.ndarray:
    """REAL audio decode via the stdlib WAV codec: PCM samples -> mono ->
    per-block RMS energy features. Deterministic; pinned by roundtrip +
    end-to-end tests in tests/test_io_and_misc.py."""
    from cardinality_estimation_evaluation_framework_spark.functions import (
        wav_codec,
    )

    samples, _rate = wav_codec.wav_decode(payload)
    return wav_codec.block_rms_features(samples, feature_dim)


def decode_video_real(payload: bytes, feature_dim: int = 16) -> np.ndarray:
    """REAL video decode via the stdlib YUV4MPEG2 codec: middle frame's
    luma plane -> the same grayscale grid features as the image path."""
    from cardinality_estimation_evaluation_framework_spark.functions import (
        y4m_codec,
    )

    n, _ = y4m_codec.y4m_frame_count(payload)
    if n == 0:
        # a header-only stream is VALID y4m but has nothing to feature-
        # extract; raise ValueError so decode_stub converts it to the
        # documented NotImplementedError seam instead of an IndexError
        # surfacing raw from an executor (ADVICE r5)
        raise ValueError("y4m stream has no frames")
    frames, _ = y4m_codec.y4m_decode(payload, frame_indexes=[n // 2])
    return y4m_codec.frame_features(frames[0], feature_dim)


def decode_stub(payload: bytes, modality: str, fake: bool, feature_dim: int = 16) -> np.ndarray:
    """Decode + feature-extract one payload.

    With ``fake=False``, every modality has a REAL decoder: images via
    PIL when importable, else the pure-stdlib PNG or baseline-JPEG codec
    (decode_image_real); audio via the stdlib WAV codec for RIFF/PCM
    payloads (decode_audio_real); video via the stdlib YUV4MPEG2 codec
    for .y4m payloads (decode_video_real). Non-PNG/JPEG images without
    PIL, compressed audio, and compressed video raise the documented
    seam error — swap a real decoder in on a cluster image that ships
    the codec libs (no libav here).
    """
    if not fake:
        from cardinality_estimation_evaluation_framework_spark.functions import (
            jpeg_codec,
            png_codec,
            wav_codec,
            y4m_codec,
        )

        try:
            if modality == "image" and (
                pil_or_none() is not None
                or png_codec.is_png(payload)
                or jpeg_codec.is_jpeg(payload)
            ):
                return decode_image_real(payload, feature_dim)
            if modality == "audio" and wav_codec.is_wav(payload):
                return decode_audio_real(payload, feature_dim)
            if modality == "video" and y4m_codec.is_y4m(payload):
                return decode_video_real(payload, feature_dim)
        except ValueError as e:
            # header magic matched but the variant is unsupported (e.g.
            # 24-bit PCM, interlaced PNG): surface the DOCUMENTED seam
            # error, not a codec-internal ValueError (ADVICE r4)
            raise NotImplementedError(
                f"{modality} payload matched a codec header but the "
                f"variant is unsupported here: {e}"
            ) from e
        raise NotImplementedError(
            f"no {modality} codec libraries in this environment; "
            "pass fake=True or plug a real decoder here"
        )
    b = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float64)
    # deterministic fake features: moments of byte histogram chunks
    chunks = np.array_split(b, feature_dim)
    return np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(media: DataFrame, fake: bool = True, feature_dim: int = 16,
                     bytes_per_batch: int = 64 << 20,
                     est_payload_bytes: int = 1 << 20) -> DataFrame:
    """mapInPandas feature extraction with payload-aware batch sizing."""
    spark = media.sparkSession
    max_records = max(16, bytes_per_batch // est_payload_bytes)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(max_records))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m, fake, feature_dim).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_nth: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    ``fake=False`` decodes REAL frame counts from YUV4MPEG2 payloads via
    the stdlib y4m codec (one linear header scan per payload, no pixel
    copies); non-y4m payloads raise the documented seam error. ``fake=
    True`` derives deterministic counts from payload length so the
    fan-out plumbing is testable with arbitrary bytes."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cardinality_estimation_evaluation_framework_spark.functions import (
            y4m_codec,
        )

        for pdf in batches:
            if not fake:
                def count(b):
                    if not y4m_codec.is_y4m(b):
                        raise NotImplementedError(
                            "only YUV4MPEG2 video decodes in this "
                            "environment; pass fake=True or plug a codec")
                    return y4m_codec.y4m_frame_count(b)[0]

                # no clamp on the real path: a zero-frame y4m payload
                # yields zero sampled rows (a clamped frame_index 0 would
                # point at a frame that does not exist) (ADVICE r5)
                n_frames = pdf["payload"].map(count).to_numpy(np.int64)
            else:
                # vectorized fan-out: frame count per row -> repeat +
                # ranges, no per-row Python
                n_frames = np.maximum(
                    pdf["payload"].map(lambda b: len(b or b"")).to_numpy(np.int64) // 1024,
                    1,
                )
            n_sampled = (n_frames + every_nth - 1) // every_nth
            bounds = np.concatenate(([0], np.cumsum(n_sampled)))
            local = np.arange(bounds[-1]) - np.repeat(bounds[:-1], n_sampled)
            frame_index = (local * every_nth).astype(np.int32)
            row_of = np.repeat(np.arange(len(pdf)), n_sampled)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[row_of],
                    "frame_index": frame_index,
                    "ts_fraction": frame_index / n_frames[row_of],
                }
            )

    return media.where(F.col("modality") == "video").mapInPandas(
        run, schema="media_id string, frame_index int, ts_fraction double"
    )
