"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata (MEDIA_SCHEMA).

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning posture — and the codec layer is
pluggable, shipping three implementations:

  * ``numpy_codec`` — a REAL decoder for uncompressed formats with no
    external library: binary PPM (``P6``, comments, 8/16-bit) images
    and PCM16 WAV (RIFF chunk walk, multi-channel) audio, dispatched by
    magic bytes and exact-value tested end-to-end through the
    distributed operators;
  * a **deterministic fake**: decodes any payload into reproducible
    arrays from its bytes alone, for plumbing assertions independent of
    format;
  * a **strict stub** that raises ``NotImplementedError`` naming the
    library a COMPRESSED format needs (Pillow / soundfile / pyav),
    marking exactly where a production deployment plugs in.

Scale posture: payloads stay opaque bytes end-to-end (no base64 blow-up,
no driver collection); per-batch decode cost is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it for large
media (the default 10k rows x multi-MB payloads would overrun executor
memory); feature vectors come back as fixed-width ``array<float>``
compatible with the similarity/dedup operators (dedup.py, similarity.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from conte_to_fresco_etl_spark.parallelism import (
    DENSE_BYTES_PER_TASK,
    ensure_min_parallelism,
)

Codec = Callable[[bytes, str], np.ndarray]

#: Fixed output grid for decode/resize fakes (H, W).
_FAKE_DIM = 8


def strict_codec(payload: bytes, modality: str) -> np.ndarray:
    """The production plug-point for COMPRESSED formats.  Uncompressed
    PPM images and PCM WAV audio decode natively (``numpy_codec``);
    anything else raises until a codec library is wired in."""
    raise NotImplementedError(
        "compressed media decode requires a codec library not present "
        "in this environment (image: Pillow, audio: soundfile, video: "
        "pyav); uncompressed PPM/WAV decode natively via numpy_codec — "
        "pass codec=... to the operator"
    )


# ---------------------------------------------------------------------------
# Real decoders for uncompressed formats (no external libraries)
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (``P6``) image to an (h, w, 3) float32 array
    of raw sample values (0..maxval).  Full format support: ``#``
    comments anywhere in the header, any whitespace runs, 8- or 16-bit
    samples (16-bit is big-endian per the spec)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    if toks[0] != b"P6":
        raise ValueError(f"not a binary PPM: magic {toks[0]!r}")
    w, h, maxval = (int(t) for t in toks[1:])
    i += 1  # exactly one whitespace byte separates header from data
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    n = w * h * 3
    data = np.frombuffer(payload, dtype=dtype, count=n, offset=i)
    return data.reshape(h, w, 3).astype(np.float32)


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode a PCM16 WAV to an (n_samples, n_channels) float32 array
    in [-1, 1).  Walks the RIFF chunk list (so extra chunks like LIST
    are skipped), requires format tag 1 (PCM) and 16-bit samples."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, channels, fmt_seen = 12, 1, False
    samples: np.ndarray | None = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 supported (tag={tag}, bits={bits})"
                )
            fmt_seen = True
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_seen or samples is None:
        raise ValueError("missing fmt/data chunk")
    return (
        samples.reshape(-1, channels).astype(np.float32) / np.float32(32768.0)
    )


def numpy_codec(payload: bytes, modality: str) -> np.ndarray:
    """Real decode for uncompressed formats, dispatched by magic bytes:
    ``P6`` → PPM image, ``RIFF..WAVE`` → PCM WAV.  Compressed payloads
    fall through to ``strict_codec``'s plug-point error."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    return strict_codec(payload, modality)


def fake_codec(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic fake decode: md5-seeded uniform grid.  Same payload
    → same 'pixels'/'samples' on every executor, so distributed tests
    assert exact values without any media library."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    if modality == "audio":
        return rng.random(64, dtype=np.float64).astype(np.float32)
    return rng.random((_FAKE_DIM, _FAKE_DIM), dtype=np.float64).astype(
        np.float32
    )


def decode_stats(df: DataFrame, codec: Codec = strict_codec) -> DataFrame:
    """Decode each payload and emit summary stats — the minimal
    decode-then-reduce pattern (schema: id, modality, n_bytes,
    payload_md5, n_values, mean, std).  One Arrow round-trip; payloads
    never leave the executor.

    ``n_bytes`` and ``payload_md5`` are computed FROM THE PAYLOAD BYTES
    inside the same Arrow batch as the decode: they pin, per row, that
    the binary column crossing the Python boundary is byte-identical to
    the source — the SQL-expressible half of the operator that the
    DuckDB oracle gates exactly (plans/catalog_text.py:q_media_decode),
    while the codec-dependent half (mean/std) stays Python-verified."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "modality": [],
                "n_bytes": [],
                "payload_md5": [],
                "n_values": [],
                "mean": [],
                "std": [],
            }
            for mid, mod, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if payload is None:
                    continue
                raw = bytes(payload)
                # float64 stats regardless of decode dtype: float32
                # accumulation would quantize the mean per batch shape,
                # while the float64 value is the one a SQL oracle can
                # recompute exactly
                arr = codec(raw, mod).astype(np.float64)
                out["media_id"].append(mid)
                out["modality"].append(mod)
                out["n_bytes"].append(len(raw))
                out["payload_md5"].append(hashlib.md5(raw).hexdigest())
                out["n_values"].append(int(arr.size))
                out["mean"].append(float(arr.mean()))
                out["std"].append(float(arr.std()))
            yield pd.DataFrame(out)

    return ensure_min_parallelism(df.select("media_id", "modality", "payload"), DENSE_BYTES_PER_TASK).mapInPandas(
        batches,
        schema="media_id long, modality string, n_bytes long, "
        "payload_md5 string, n_values long, mean double, std double",
    )


def extract_features(
    df: DataFrame, codec: Codec = strict_codec, dim: int = 64
) -> DataFrame:
    """Decode → fixed-width feature vector (``array<float>``), the
    embedding-column producer: output feeds similarity.brute_force_topk /
    lsh_topk and dedup.embedding_neardup_pairs unchanged.

    The fake path flattens/pads the decoded array to ``dim`` — a real
    deployment swaps in a model forward pass per Arrow batch (the batch
    boundary is exactly where GPU batching would sit)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for mid, mod, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if payload is None:
                    continue
                flat = codec(bytes(payload), mod).ravel().astype(np.float32)
                vec = np.zeros(dim, dtype=np.float32)
                vec[: min(dim, flat.size)] = flat[:dim]
                ids.append(mid)
                vecs.append(vec.tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return ensure_min_parallelism(df.select("media_id", "modality", "payload"), DENSE_BYTES_PER_TASK).mapInPandas(
        batches, schema="media_id long, embedding array<float>"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    codec: Codec = strict_codec,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-emit as binary (float32
    bytes in the fake path; a real codec would re-encode).  Keeps the
    MEDIA_SCHEMA shape so resized outputs flow back into the same
    pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, mod, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if payload is None or mod != "image":
                    continue
                img = codec(bytes(payload), mod)
                ys = (np.arange(height) * img.shape[0] // height).clip(
                    0, img.shape[0] - 1
                )
                xs = (np.arange(width) * img.shape[1] // width).clip(
                    0, img.shape[1] - 1
                )
                ids.append(mid)
                payloads.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return ensure_min_parallelism(df.select("media_id", "modality", "payload"), DENSE_BYTES_PER_TASK).mapInPandas(
        batches, schema="media_id long, payload binary"
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    codec: Codec = strict_codec,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row
    explosion happens inside the Arrow batch, not via ``explode`` on a
    materialized frame array — frames never exist as one giant row).
    Frame count derives from ``meta.duration_ms``; the fake 'frame' is
    the decoded grid perturbed per frame index."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, ts, payloads = [], [], [], []
            for mid, mod, payload, meta in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"], pdf["meta"]
            ):
                if payload is None or mod != "video":
                    continue
                duration = (meta or {}).get("duration_ms") or 0
                n_frames = max(1, int(duration // every_ms))
                base = codec(bytes(payload), mod)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    ts.append(i * every_ms)
                    payloads.append((base + np.float32(i)).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_index": idxs,
                    "timestamp_ms": ts,
                    "payload": payloads,
                }
            )

    return ensure_min_parallelism(df.select("media_id", "modality", "payload", "meta"), DENSE_BYTES_PER_TASK).mapInPandas(
        batches,
        schema="media_id long, frame_index int, timestamp_ms long, "
        "payload binary",
    )
