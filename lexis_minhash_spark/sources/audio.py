"""Audio column plumbing: PCM16 WAV encode/decode + SNR, as vectorized
pandas UDFs over ``mapInPandas``-friendly kernels.

The input-table contract (BASELINE.json input_hint) stores clips as opaque
``bytes: binary`` with typed metadata (sr_hz, dur_ms, codec).  In this
sandbox the only codec is ``pcm_s16le`` WAV, synthesized deterministically
(sources/synth.py); real decoders (opus/mp3/...) are stubbed behind
``NotImplementedError`` — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested either way.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

SUPPORTED_CODECS = ("pcm_s16le",)


def pcm16_to_wav(samples: np.ndarray, sr_hz: int) -> bytes:
    """Minimal RIFF/WAVE container around int16 mono PCM (deterministic)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def wav_to_pcm16(blob: bytes) -> tuple[np.ndarray, int]:
    """Parse the minimal WAV produced by pcm16_to_wav → (int16 samples, sr).
    Validates the RIFF magic; raises ValueError on anything else."""
    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    sr_hz = struct.unpack_from("<I", blob, 24)[0]
    data_len = struct.unpack_from("<I", blob, 40)[0]
    samples = np.frombuffer(blob, dtype="<i2", offset=44, count=data_len // 2)
    return samples, sr_hz


def decode_clip(blob: bytes, codec: str) -> np.ndarray:
    """Decode one clip to float32 PCM in [-1, 1). Only pcm_s16le WAV is real
    in this container; other codecs raise (clearly-marked stub)."""
    if codec == "pcm_s16le":
        samples, _ = wav_to_pcm16(blob)
        return samples.astype(np.float32) / 32768.0
    raise NotImplementedError(
        f"codec {codec!r}: decoder libraries are not available in this "
        "container; only pcm_s16le WAV decoding is implemented"
    )


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``reference`` in dB."""
    n = min(reference.shape[0], test.shape[0])
    if n == 0:
        return float("-inf")
    ref = reference[:n].astype(np.float64)
    noise = ref - test[:n].astype(np.float64)
    p_sig = float((ref**2).sum())
    p_noise = float((noise**2).sum())
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("n_samples", IntegerType(), False),
        StructField("rms", DoubleType(), False),
        StructField("peak", DoubleType(), False),
        StructField("zero_crossings", IntegerType(), False),
        StructField("frame_energies", ArrayType(FloatType(), False), False),
    ]
)


def audio_features_udf(frame_ms: int = 100, max_frames: int = 64):
    """pandas UDF (bytes, codec, sr_hz) → decoded-audio feature struct.

    The decode is per-row (binary blobs are ragged) but all feature math is
    NumPy; Arrow moves the binary column in batches.  frame_energies is the
    frame-sampled energy envelope (the multimodal 'frame-sample' shape)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(AUDIO_FEATURE_SCHEMA)
    def _features(
        it: Iterator[tuple[pd.Series, pd.Series, pd.Series]]
    ) -> Iterator[pd.DataFrame]:
        for blobs, codecs, srs in it:
            rows = []
            for blob, codec, sr in zip(blobs, codecs, srs):
                if blob is None:
                    rows.append((0, 0.0, 0.0, 0, []))
                    continue
                # no bytes() copy: decode_clip works on any buffer (slice
                # compare + np.frombuffer) — same as the headline
                # audio_signature_udf path
                pcm = decode_clip(blob, str(codec))
                n = int(pcm.shape[0])
                rms = float(np.sqrt((pcm.astype(np.float64) ** 2).mean())) if n else 0.0
                peak = float(np.abs(pcm).max()) if n else 0.0
                zc = int(np.count_nonzero(np.diff(np.signbit(pcm)))) if n > 1 else 0
                flen = max(1, int(int(sr) * frame_ms / 1000))
                nframes = min(max_frames, max(1, n // flen)) if n else 0
                energies = [
                    float(np.sqrt((pcm[i * flen : (i + 1) * flen].astype(np.float64) ** 2).mean()))
                    for i in range(nframes)
                ]
                rows.append((n, rms, peak, zc, energies))
            yield pd.DataFrame(
                rows, columns=["n_samples", "rms", "peak", "zero_crossings", "frame_energies"]
            )

    return _features


def with_audio_features(
    df: DataFrame,
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    id_col: str = "clip_id",
) -> DataFrame:
    u = audio_features_udf()
    return (
        df.select(id_col, bytes_col, codec_col, sr_col)
        .withColumn("_f", u(F.col(bytes_col), F.col(codec_col), F.col(sr_col)))
        .select(
            id_col,
            F.col("_f.n_samples").alias("n_samples"),
            F.col("_f.rms").alias("rms"),
            F.col("_f.peak").alias("peak"),
            F.col("_f.zero_crossings").alias("zero_crossings"),
            F.col("_f.frame_energies").alias("frame_energies"),
        )
    )
