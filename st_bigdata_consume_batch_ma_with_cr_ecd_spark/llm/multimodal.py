"""Multimodal column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches, never
single rows. The actual codec step is STUBBED (no image/audio libs in
this container): ``fake_decode=True`` derives deterministic pseudo
features from the payload bytes so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and testable;
``fake_decode=False`` raises NotImplementedError where a real
``PIL.Image.open`` / ``soundfile.read`` call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, width int, height int"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a text column as an opaque binary payload (stand-in for an
    image/audio blob column read from parquet)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", *, fake_decode: bool = True
) -> DataFrame:
    """Per-payload feature extraction via mapInPandas.

    Fake decode: width/height derived from the first two payload bytes
    (deterministic, engine-independent) — replace the marked block with
    a real decoder when codec libs are available.
    """

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            if not fake_decode:
                raise NotImplementedError(
                    "real image decode needs PIL/libvips — not available in this container"
                )
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            width = payloads.map(lambda b: (b[0] % 64) + 1 if b else 0)
            height = payloads.map(lambda b: (b[1] % 64) + 1 if b is not None and len(b) > 1 else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, FEATURE_SCHEMA)
