"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample stages
as Arrow-batched `mapInPandas` operators.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested.  The actual codec work is STUBBED: no
image/audio libraries exist in this container, so `decode_payload`
raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder (header parse + md5-derived pixels) stands
in.  Swapping in PIL/ffmpeg later only changes `_decode_real`.

Payload format of the synthetic media blobs (media_blob()):
  bytes 0-3   magic b'MMG1'
  bytes 4-5   width  (big-endian uint16)
  bytes 6-7   height (big-endian uint16)
  byte  8     modality (0=image, 1=audio, 2=video)
  bytes 9..   counter-block stream: block i = md5(f"{ref}:{i}").digest()
              (16 bytes each), concatenated and truncated to payload_len

The counter-block stream (vs a digest chain) keeps every derived value
closed-form over string md5, so the DuckDB oracle can verify both the
metadata decode AND the per-frame signatures bit-for-bit
(sql_oracles.multimodal_meta_sql / frame_sample_sql).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"MMG1"
MODALITIES = ("image", "audio", "video")

META_SCHEMA = (
    "width int, height int, modality string, payload_bytes long, valid boolean"
)


def media_blob(ref: str, payload_len: int = 256) -> bytes:
    """Deterministic synthetic media payload for a media_ref."""
    h = hashlib.md5(ref.encode()).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    modality = h[2] % 3
    stream = b""
    i = 0
    while len(stream) < payload_len:
        stream += hashlib.md5(f"{ref}:{i}".encode()).digest()
        i += 1
    return (
        MAGIC
        + struct.pack(">HHB", width, height, modality)
        + stream[:payload_len]
    )


def media_blob_col(ref, payload_len: int = 256):
    """Column form of :func:`media_blob`: MAGIC + packed
    (width, height, modality) header + md5 counter-block stream,
    entirely in JVM built-ins (md5/unhex/hex/lpad/concat) — byte-for-
    byte equal to the Python reference (pinned by test), zero Python
    in the plan.  NULL ref propagates to NULL blob."""
    hhex = F.md5(ref)

    def byte_at(pos: int):
        return F.conv(F.substring(hhex, pos, 2), 16, 10).cast("int")

    def be_bytes(col, n_hex: int):
        return F.unhex(F.lpad(F.lower(F.hex(col)), n_hex, "0"))

    width = F.lit(16) + byte_at(1) % 240
    height = F.lit(16) + byte_at(3) % 240
    modality = byte_at(5) % 3
    n_blocks = -(-payload_len // 16)  # ceil: md5 digests are 16 bytes
    stream = F.concat(
        *[
            F.unhex(F.md5(F.concat(ref, F.lit(f":{i}"))))
            for i in range(n_blocks)
        ]
    )
    if payload_len % 16:
        stream = F.substring(stream, 1, payload_len)
    return F.concat(
        F.lit(MAGIC),
        be_bytes(width, 4),
        be_bytes(height, 4),
        be_bytes(modality, 2),
        stream,
    )


def with_media_blob(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Attach the deterministic binary payload column for each ref —
    pure codegen (:func:`media_blob_col`); used by tests/benchmarks
    where real object-store bytes would be fetched instead."""
    return df.withColumn("media_blob", media_blob_col(F.col(ref_col)))


def _decode_real(payload: bytes) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not present in this "
        "container; run with fake=True or install codecs"
    )


def _decode_fake(payload: bytes) -> dict:
    if payload is None or len(payload) < 9 or payload[:4] != MAGIC:
        return {
            "width": None, "height": None, "modality": None,
            "payload_bytes": len(payload) if payload is not None else 0,
            "valid": False,
        }
    width, height, mod = struct.unpack(">HHB", payload[4:9])
    return {
        "width": width,
        "height": height,
        "modality": MODALITIES[mod % 3],
        "payload_bytes": len(payload) - 9,
        "valid": True,
    }


def decode_metadata(
    df: DataFrame, blob_col: str = "media_blob", fake: bool = True
) -> DataFrame:
    """Decode stage over `mapInPandas`: streams Arrow batches of binary
    payloads, emits typed metadata columns next to the input columns.
    Batch-shaped exactly like a real decoder would be (bytes in one
    column per batch, bounded by arrow.maxRecordsPerBatch)."""
    decode = _decode_fake if fake else _decode_real
    in_schema = df.schema
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
        + ", " + META_SCHEMA
    )
    idx = [f.name for f in in_schema].index(blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf.iloc[:, idx]]
            meta_df = pd.DataFrame(metas, index=pdf.index)
            yield pd.concat([pdf, meta_df], axis=1)

    return df.mapInPandas(run, out_schema)


FEATURE_SCHEMA = (
    "mean_byte double, max_byte int, frac_high double, n_bytes long"
)


def extract_features(
    df: DataFrame, blob_col: str = "media_blob"
) -> DataFrame:
    """Feature-extract stage: byte-level statistics of the payload as
    a typed feature row per blob — the shape of a real embedding /
    perceptual-hash stage (batched bytes in, fixed-width numerics out).

    Arrow-batched mapInPandas doing genuine per-byte work in Python;
    every statistic is also closed-form over the md5 hex stream, so
    the DuckDB oracle replays it exactly (media_features_sql)."""
    in_schema = df.schema
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
        + ", " + FEATURE_SCHEMA
    )
    idx = [f.name for f in in_schema].index(blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf.iloc[:, idx]:
                payload = bytes(blob)[9:] if blob is not None else b""
                n = len(payload)
                if n == 0:
                    feats.append(
                        {"mean_byte": 0.0, "max_byte": 0,
                         "frac_high": 0.0, "n_bytes": 0}
                    )
                    continue
                # n is a power of two for the synthetic payloads, so
                # these ratios are exact doubles — no rounding, which
                # would hit banker's-vs-half-up tie differences vs SQL.
                feats.append(
                    {
                        "mean_byte": sum(payload) / n,
                        "max_byte": max(payload),
                        "frac_high": sum(1 for b in payload if b > 127) / n,
                        "n_bytes": n,
                    }
                )
            yield pd.concat(
                [pdf, pd.DataFrame(feats, index=pdf.index)], axis=1
            )

    return df.mapInPandas(run, out_schema)


def resize_media(
    df: DataFrame, factor: int = 2, blob_col: str = "media_blob",
    thumb_bytes: int = 64,
) -> DataFrame:
    """Resize stage: emit the downscaled dimensions plus a signature
    of the leading payload slice (the deterministic stand-in for the
    resampled pixel buffer a real resizer would produce).

    Same mapInPandas batch shape a PIL/ffmpeg-backed resizer would
    use; only the inner byte transform is the synthetic stand-in."""
    in_schema = df.schema
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
        + ", new_width int, new_height int, thumb_sig string"
    )
    idx = [f.name for f in in_schema].index(blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf.iloc[:, idx]:
                raw = bytes(blob) if blob is not None else b""
                if len(raw) < 9 or raw[:4] != MAGIC:
                    rows.append(
                        {"new_width": None, "new_height": None,
                         "thumb_sig": None}
                    )
                    continue
                width, height, _mod = struct.unpack(">HHB", raw[4:9])
                thumb = raw[9 : 9 + thumb_bytes]
                rows.append(
                    {
                        "new_width": max(width // factor, 1),
                        "new_height": max(height // factor, 1),
                        "thumb_sig": hashlib.md5(
                            thumb.hex().encode()
                        ).hexdigest(),
                    }
                )
            yield pd.concat(
                [pdf, pd.DataFrame(rows, index=pdf.index)], axis=1
            )

    return df.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 4,
    blob_col: str = "media_blob",
    frame_bytes: int = 16,
) -> DataFrame:
    """Frame-sampling stage (video path): slice the payload stream into
    fixed-size frames, keep every n-th.  Deterministic byte-level
    stand-in for real frame extraction; exercises the explode shape a
    video pipeline produces (one row per sampled frame).

    frame_sig hashes the hex encoding of the frame bytes (md5 over a
    string) so the signature is replayable by the DuckDB oracle, which
    has no binary-input hash.  A payload shorter than one frame emits
    zero rows (explode of an empty array), not a phantom frame 0."""
    payload = F.expr(f"substring({blob_col}, 10, 2147483647)")
    n_frames = F.floor(F.length(payload) / frame_bytes).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(
                payload, i * frame_bytes + 1, frame_bytes
            ).alias("frame"),
        ),
    )
    sampled = F.when(
        n_frames > 0,
        F.filter(frames, lambda fr: fr["frame_no"] % every_n == 0),
    ).otherwise(
        F.lit([]).cast("array<struct<frame_no:int,frame:binary>>")
    )
    return df.select(
        "*", F.explode(sampled).alias("_f")
    ).select(
        *[c for c in df.columns],
        F.col("_f.frame_no").alias("frame_no"),
        F.md5(F.lower(F.hex(F.col("_f.frame")))).alias("frame_sig"),
    )
