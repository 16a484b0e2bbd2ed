"""Multimodal column plumbing: opaque `binary` payloads + typed
metadata, decoded/feature-extracted via Arrow-batched `mapInPandas`.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
interface a real decoder (PIL / torchaudio / pyav) would use — the
Spark-side plumbing (schema, batch iteration, partitioning, output
shape) is real and tested. Swap `_fake_decode` for a real library
call and nothing else changes.

Scale notes: payloads stay in executor memory one Arrow batch at a
time (`mapInPandas` is streaming — never a full-partition
materialization); feature extraction is embarrassingly parallel; the
only shuffle is whatever the caller adds afterwards.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

MM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """DETERMINISTIC FAKE decoder (no media libs in this container).

    A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # raises on bad data
        return img.width, img.height, np.asarray(img)

    The fake derives a stable "image" from the payload bytes so the
    plumbing (shapes, batching, feature math) is exercised end-to-end.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    width = 16 + int(arr[:4].sum()) % 64 if len(arr) >= 4 else 16
    height = max(len(arr) // max(width, 1), 1)
    pixels = arr[: width * height].reshape(height, width) if len(arr) >= width * height else arr.reshape(1, -1)
    return width, height, pixels


def attach_media(df: DataFrame) -> DataFrame:
    """Build the multimodal frame: binary payload + typed metadata
    struct. In production the payload column comes straight from the
    lakehouse (parquet BINARY / external object refs)."""
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("media_format"),
            F.octet_length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_features(mm: DataFrame) -> DataFrame:
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload, meta in zip(batch["doc_id"], batch["payload"], batch["media_meta"]):
                width, height, pixels = _fake_decode(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_format": meta["media_format"],
                        "n_bytes": int(meta["n_bytes"]),
                        "width": int(width),
                        "height": int(height),
                        "feat_mean": float(np.round(pixels.mean(), 6)),
                        "feat_std": float(np.round(pixels.std(), 6)),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MM_SCHEMA.fields])

    return mm.mapInPandas(extract, MM_SCHEMA)


@register("mm_decode_stub")  # rows-only: decode is library-dependent, not SQL
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return decode_features(attach_media(d)).orderBy("doc_id")
