"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

A 100 TB training-data pipeline carries media as binary columns next to the
text: this module provides the Spark-side plumbing — schemas, batch-shaped
UDF signatures, partition sizing — with the *codec* step stubbed: the
runtime has no image/audio libraries, so ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic parser of our synthetic payload header.  Swapping the fake
for PIL/ffmpeg changes ONE function body; every schema, partition and test
stays.

Scale notes:
- media rows are orders of magnitude wider than text rows → ``blob_repartition``
  targets a bytes-per-partition budget, not a row count;
- features/frames flow through ``mapInPandas`` (columnar Arrow batches, no
  per-row pickling);
- frame sampling EXPLODES row count — it returns one row per sampled frame
  with the frame index, mirroring how a video pipeline fans out.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

#: media table schema: payload + kind + declared metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("data", BinaryType()),
    StructField("declared_width", IntegerType()),
    StructField("declared_height", IntegerType()),
])

_MAGIC = b"SYNM"  # synthetic media header: magic, kind byte, w, h, n_frames


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media derived from the documents table:
    payload = header(kind, w, h, frames) + utf-8 text bytes."""
    from ..core.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id AS media_id",
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
        "ELSE 'video' END AS kind",
        # header: 'SYNM' + kind(1B) + width(2B) + height(2B) + frames(2B),
        # all big-endian via hex/unhex (ANSI mode forbids int→binary casts)
        "concat(X'53594E4D', "
        " unhex(lpad(hex(doc_id % 3), 2, '0')),"
        " unhex(lpad(hex((doc_id % 64 + 1) * 16), 4, '0')),"
        " unhex(lpad(hex((doc_id % 36 + 1) * 16), 4, '0')),"
        " unhex(lpad(hex(doc_id % 120 + 1), 4, '0')),"
        " encode(text, 'UTF-8')) AS data",
        "CAST((doc_id % 64 + 1) * 16 AS INT) AS declared_width",
        "CAST((doc_id % 36 + 1) * 16 AS INT) AS declared_height")


def blob_repartition(df: DataFrame, target_bytes: int = 128 << 20,
                     size_col: str = "data") -> DataFrame:
    """Repartition wide binary rows to a bytes-per-partition budget.

    Uses the actual payload sizes (one cheap agg) instead of row counts —
    with 10 MB media rows, 'rows per partition' is the wrong unit."""
    total = df.select(F.sum(F.length(size_col))).first()[0] or 0
    parts = max(1, int(total / target_bytes) + 1)
    return df.repartition(parts)


_DECODE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("n_payload_bytes", LongType()),
])


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Parse media headers → (dimensions, frame count, payload size).

    Real codecs are NOT available in this runtime; ``fake=True`` decodes
    the synthetic SYNM header deterministically.  A production build
    replaces ``_decode_batch``'s body with PIL/libav calls — signature,
    schema and partitioning are already production-shaped.
    """
    if not fake:
        raise NotImplementedError(
            "no image/audio codecs in this runtime — pass fake=True for "
            "the deterministic synthetic decoder")

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"],
                                       pdf["data"]):
                b = bytes(data)
                assert b[:4] == _MAGIC, "bad synthetic payload"
                w, h, nf = struct.unpack(">HHH", b[5:11])
                rows.append((mid, kind, w, h, nf, len(b) - 11))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              _DECODE_SCHEMA.fields])

    return df.select("media_id", "kind", "data").mapInPandas(
        _decode_batch, _DECODE_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic feature vectors from payload bytes (the stand-in for
    an embedding model): sha256-seeded floats in [0, 1), Arrow-batched.

    The digest domain is the UPPERCASE HEX encoding of the payload, not
    the raw bytes: hex is pure ASCII, so an ANSI-SQL engine can reproduce
    the exact digest (DuckDB 1.0 hashes VARCHAR only) and the whole media
    pipeline stays oracle-checkable end-to-end."""
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ])

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                digest = hashlib.sha256(
                    bytes(data).hex().upper().encode("ascii")).digest()
                vec = [struct.unpack(">I", digest[4 * i: 4 * i + 4])[0]
                       / 2 ** 32 for i in range(dim)]
                out.append((mid, vec))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return df.select("media_id", "data").mapInPandas(_feat, schema)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index (0, n, 2n, …) with a deterministic per-frame byte digest —
    the fan-out shape of a real frame extractor (decode stub as above)."""
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_digest", StringType()),
    ])

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data)
                (nf,) = struct.unpack(">H", b[9:11])
                for idx in range(0, nf, every_n):
                    d = hashlib.sha256(b + idx.to_bytes(4, "big")).hexdigest()
                    out.append((mid, idx, d[:16]))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return (df.filter(F.col("kind") == "video")
            .select("media_id", "data").mapInPandas(_frames, schema))
