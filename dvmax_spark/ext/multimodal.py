"""[EXT] Multimodal column plumbing: image/audio/video as opaque
``binary`` columns with typed metadata structs.

The decode kernels (PIL/librosa/ffmpeg) are NOT in this container —
they are stubbed behind ``_HAS_*`` import gates with a deterministic
fake so the Spark-side machinery (schema, Arrow batch shape,
mapInPandas partitioning, metadata propagation) is real and tested.
At deploy time only the ``_decode_*_impl`` bodies change.

Batching model: mapInPandas streams Arrow record batches through the
Python worker — one worker call per batch, vectorized over rows, so
per-row overhead is amortized; partition sizing (not row count)
controls memory. At 100 TB you'd repartition so each task holds
~128-256 MB of binary payload.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # decode libs are not in the image — gate them
    import PIL.Image  # type: ignore # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _decode_image_impl(payload: bytes) -> tuple[int, int, float]:
    """Real decode when PIL is present; deterministic fake otherwise.

    The fake derives (width, height, mean_luma) from the payload bytes
    so tests are stable and content-sensitive."""
    if _HAS_PIL:  # pragma: no cover - lib absent in this container
        raise NotImplementedError("wire PIL decode here at deploy time")
    if not payload:
        return (0, 0, 0.0)
    w = 64 + payload[0] % 64
    h = 64 + payload[-1] % 64
    luma = (sum(payload[:256]) % 25600) / 100.0
    return (w, h, luma)


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Testing helper: synthesize a deterministic binary payload column
    (stands in for real image bytes read from object storage)."""
    payload = F.encode(
        F.concat_ws("|", F.col(id_col).cast("string"), F.md5(F.col(id_col).cast("string"))),
        "utf-8",
    )
    return df.withColumn("payload", payload)


def extract_image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode / feature-extract over binary payloads via mapInPandas.

    Arrow-batched: the worker sees pandas DataFrames, loops only within
    a batch (cheap), and yields a typed result frame matching
    IMAGE_FEATURES_SCHEMA.
    """
    id_name, payload_name = id_col, payload_col

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_name], pdf[payload_name]):
                payload = bytes(payload) if payload is not None else b""
                w, h, luma = _decode_image_impl(payload)
                rows.append((int(doc_id), len(payload), w, h, luma))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "mean_luma"]
            )

    return df.select(id_col, payload_col).mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame index
    list per asset — the schema/partitioning shape of real frame
    extraction. Real decode would replace the index synthesis."""
    n_frames = F.lit(100) + (F.col(id_col) % 50).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(id_col, F.explode(idx).alias("frame_idx"))
