"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata, processed with Arrow-batched mapInPandas.

Container note: no image/audio codecs ship in this environment, so the
actual decode step is STUBBED — ``decode_media`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic header parse (documented below) so the Spark-side
plumbing (binary schema, batch iteration, partition sizing, output
struct) is real and testable end-to-end.

Scale notes:
- Binary payloads ride ordinary parquet binary columns; scans prune
  them unless selected (keep metadata in sibling scalar columns so
  filters never touch bytes).
- mapInPandas streams Arrow record batches: bound batch bytes with
  spark.sql.execution.arrow.maxRecordsPerBatch when payloads are MBs.
- Decode is CPU-bound and embarrassingly parallel — repartition to
  cores, never collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id bigint, mime string, n_bytes int, "
                  "width int, height int, n_frames int")


def attach_payload(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column (+ typed metadata)
    from a text column — the fixture corpus has no real media, so the
    bytes are the utf-8 encoding standing in for an image blob."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.length(F.col(text_col)).alias("n_bytes"),
    )


def _fake_header_parse(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: 'parse' a header from the
    first bytes. width = first byte + 64; height = (len % 480) + 16;
    n_frames = (second byte % 30) + 1."""
    b0 = payload[0] if len(payload) > 0 else 0
    b1 = payload[1] if len(payload) > 1 else 0
    return b0 + 64, (len(payload) % 480) + 16, (b1 % 30) + 1


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to (width, height, n_frames) metadata via
    mapInPandas (Arrow batches, one Python roundtrip per partition
    batch — never per row).

    Real decoding requires PIL/ffmpeg, absent in this container:
    ``fake=False`` raises NotImplementedError. ``fake=True`` runs the
    deterministic header parse, exercising the identical plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this "
            "environment; pass fake=True for the deterministic stub")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(_fake_header_parse)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["n_bytes"].astype("int32"),
                "width": parsed.map(lambda t: t[0]).astype("int32"),
                "height": parsed.map(lambda t: t[1]).astype("int32"),
                "n_frames": parsed.map(lambda t: t[2]).astype("int32"),
            })

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  fake: bool = False) -> DataFrame:
    """Resize decoded media metadata. Real implementation would decode
    → resample → re-encode inside mapInPandas; without codecs the
    ``fake=True`` path just rewrites the metadata (same batch plumbing,
    no pixels)."""
    if not fake:
        raise NotImplementedError("image resampling requires PIL; not in env")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(resize, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, features array<float>"


def extract_features(df: DataFrame, dim: int = 16,
                     fake: bool = False) -> DataFrame:
    """Feature extraction: binary payload → fixed-dim float vector —
    the embed-the-modality step before similarity search / dedup over
    media. A real implementation loads a vision/audio encoder inside
    ``mapInPandas`` (model initialized once per PYTHON WORKER, outside
    the batch loop — never per batch) and runs batched inference.

    No model runtimes ship in this container, so ``fake=True``
    substitutes a deterministic md5-derived vector (16 bytes of
    md5(payload) → ``dim`` floats in [0,1)); the Arrow plumbing —
    binary in, array<float> out, batch shapes — is identical, and the
    output feeds the similarity operators unchanged."""
    if not fake:
        raise NotImplementedError(
            "no vision/audio model runtime in this environment; "
            "pass fake=True for the deterministic stub")
    import hashlib

    def embed(payload: bytes) -> list[float]:
        out: list[float] = []
        counter = 0
        while len(out) < dim:
            h = hashlib.md5(payload + counter.to_bytes(4, "big")).digest()
            out.extend(b / 256.0 for b in h)
            counter += 1
        return out[:dim]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (a real model would be loaded HERE, once per worker)
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "features": pdf["payload"].map(embed),
            })

    return df.mapInPandas(extract, schema=FEATURES_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms int"


def sample_frames(df: DataFrame, every_n: int = 1,
                  fake: bool = False) -> DataFrame:
    """Demux media into one row per sampled frame — mapInPandas with
    row FAN-OUT (a batch yields more rows than it received), the shape
    a video pipeline needs. The fake path emits every ``every_n``-th of
    the decoded n_frames with a synthetic 40 ms/frame timestamp."""
    if not fake:
        raise NotImplementedError("video demux requires ffmpeg; not in env")

    def demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss = [], [], []
            for doc_id, n_frames in zip(pdf["doc_id"], pdf["n_frames"]):
                for i in range(0, int(n_frames), every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 40)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_ts_ms": pd.Series(tss, dtype="int32"),
            })

    return df.mapInPandas(demux, schema=FRAME_SCHEMA)
