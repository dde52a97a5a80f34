"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque binary payloads + typed metadata, with Arrow-batched
feature extraction via ``mapInPandas``.

The Spark-side machinery is fully real — binary columns, metadata structs,
partition-preserving batch iteration, declared output schema. The *decoder*
is the only stub: this container ships no PIL/librosa/ffmpeg, so decoding
falls back to a deterministic byte-level featurizer (documented below) and
raises ``NotImplementedError`` when a real decode is explicitly requested.
Swapping in a real decoder changes one function, none of the plumbing.

Scale notes: feature extraction is embarrassingly parallel (mapInPandas, no
shuffle); payload bytes stream through Arrow record batches whose size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — tune down for
multi-MB blobs so a batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["image", "audio", "video"]

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("size_bytes", T.LongType()),
                    T.StructField("width", T.LongType()),
                    T.StructField("height", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("histogram8", T.ArrayType(T.LongType())),
    ]
)


def synthesize_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary-column fixture: payload = UTF-8 bytes of the
    text, kind round-robins image/audio/video, metadata derived from the
    payload. Stands in for real decoded media so the downstream plumbing
    (schema, batching, featurization) is exercised with real byte traffic."""
    payload = F.encode(F.col(text_col), "UTF-8")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.pmod(F.col("doc_id"), 3) + 1).cast("int")
    )
    meta = F.struct(
        F.length(payload).cast("long").alias("size_bytes"),
        (F.pmod(F.col("doc_id"), 64) + 1).cast("long").alias("width"),
        (F.pmod(F.col("doc_id"), 48) + 1).cast("long").alias("height"),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode_features(payload: pd.Series) -> pd.DataFrame:
    """Deterministic byte-level featurizer (the decode STUB): per blob, the
    byte count, mean byte value, and an 8-bin byte histogram. Replace with a
    real decoder (PIL.Image.open / librosa.load) in production; the
    mapInPandas contract is identical."""
    import numpy as np

    sizes, means, hists = [], [], []
    for buf in payload:
        arr = np.frombuffer(buf, dtype=np.uint8)
        sizes.append(len(arr))
        means.append(float(arr.mean()) if len(arr) else 0.0)
        hists.append(np.bincount(arr % 8, minlength=8).astype("int64").tolist())
    return pd.DataFrame({"size_bytes": sizes, "byte_mean": means, "histogram8": hists})


def extract_features(blobs: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``real_decode=True`` demands an actual media decoder, which this
    environment does not ship — it raises ``NotImplementedError`` eagerly
    (gated import), rather than failing per-task at runtime."""
    if real_decode:
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/ffmpeg, not available "
            "in this environment; use real_decode=False for the "
            "deterministic byte-featurizer stub"
        )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode_features(pdf["payload"])
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": pdf["kind"],
                }
            )
            yield pd.concat([out, feats], axis=1)

    return blobs.mapInPandas(featurize, schema=FEATURE_SCHEMA)
