"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata (training-data pipeline ops).

The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — is real and tested. The actual codec
work is STUBBED: this container ships no image/audio libraries, so
``decode_image_batch`` uses a deterministic fake decoder (and raises
``NotImplementedError`` if asked for a real codec). Swapping in
PIL/torchaudio later only changes the inside of one function.

Scale notes: binary payloads make rows wide — ``mapInPandas`` with a
bounded ``spark.sql.execution.arrow.maxRecordsPerBatch`` keeps Arrow
batches in memory; repartition by asset_id before heavy decode so
tasks are balanced by payload count, not by file layout.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes | None) -> tuple[int | None, int | None, int | None]:
    """Deterministic stand-in for a real image decode: derives fake
    (width, height) from the byte content. REAL codecs go here."""
    if payload is None:
        return None, None, None
    n = len(payload)
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return n, 16 + h % 1024, 16 + (h // 1024) % 1024


def decode_image_batch(df: DataFrame, real_codec: bool = False) -> DataFrame:
    """payload → (n_bytes, width, height, checksum) via mapInPandas.

    Arrow-batched; one Python worker pass over each partition. With
    ``real_codec=True`` this would call PIL — not available in this
    environment, so it raises (clearly-marked stub)."""
    if real_codec:
        raise NotImplementedError(
            "real image codecs (PIL/libvips) are not installed in this "
            "environment; the deterministic fake decoder is the test path"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nb, ws, hs, cks = [], [], [], []
            for payload in pdf["payload"]:
                n, w, h = _fake_decode(payload)
                nb.append(n)
                ws.append(w)
                hs.append(h)
                cks.append(
                    None if payload is None else zlib.crc32(bytes(payload)) & 0x7FFFFFFF
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(nb, dtype="Int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "checksum": pd.array(cks, dtype="Int64"),
                }
            )

    return df.mapInPandas(decode, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: emits one row per sampled frame
    index (the decode itself is the stubbed step). Demonstrates the
    1→N explode shape the real operator needs."""
    n_frames = (F.length(F.col("payload")) / 1000).cast("int") + 1  # fake frame count
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.filter(F.col("kind") == "video").select(
        "asset_id", F.explode(idx).alias("frame_idx")
    )


def make_fake_assets(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic synthetic asset table (binary payloads)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = [
        (
            i,
            kinds[i % 3],
            bytes(rng.integers(0, 256, size=int(rng.integers(100, 5000))).tolist()),
            f"application/x-fake-{kinds[i % 3]}",
            {"src": f"gen{i % 5}"},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)
