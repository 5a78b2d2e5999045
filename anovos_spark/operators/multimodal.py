"""Multimodal (image/audio/video) column plumbing.

Policy: media travel as opaque ``binary`` columns with typed metadata
structs beside them.  The Spark-side machinery — schema, Arrow-batched
mapInPandas, partition sizing — is real and tested; the actual codec calls
are stubbed behind ``_decode_image``/``_decode_audio`` because the codec
libraries are not in this container (clearly marked; swap the stub body
for PIL/soundfile in production).

At scale: mapInPandas streams Arrow batches, so per-batch memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob
size skew; repartition by a size-bucketed key before decode when blob
sizes are heavy-tailed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "id long, n_bytes long, content_md5 string, format string, decoded int"
)


def _sniff_format(b: bytes) -> str:
    """Cheap magic-byte sniffing — real logic, no codec needed."""
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def _decode_image(b: bytes) -> dict:
    """STUB: image decode (PIL not in this container).

    Production body: ``img = PIL.Image.open(io.BytesIO(b))`` →
    width/height/mode + resize/feature-extract.  The deterministic fake
    keeps the pipeline testable end to end."""
    raise NotImplementedError("image codec not available in this environment")


def media_metadata(
    idf: DataFrame, binary_col: str, id_col: str
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column via
    mapInPandas: [id, n_bytes, content_md5, format, decoded].

    The md5/size/sniff path is real; `decoded` is 0 because the codec stage
    is stubbed (see _decode_image)."""
    b_col, i_col = binary_col, id_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[b_col]
            yield pd.DataFrame(
                {
                    "id": pdf[i_col].astype("int64"),
                    "n_bytes": blobs.map(lambda x: len(x) if x is not None else 0).astype("int64"),
                    "content_md5": blobs.map(
                        lambda x: hashlib.md5(x).hexdigest() if x is not None else None
                    ),
                    "format": blobs.map(
                        lambda x: _sniff_format(bytes(x)) if x is not None else None
                    ),
                    "decoded": 0,
                }
            )

    return idf.select(i_col, b_col).mapInPandas(extract, schema=DECODE_SCHEMA)


def frame_sample_plan(
    idf: DataFrame,
    binary_col: str,
    id_col: str,
    every_n_bytes: int = 1 << 16,
    max_samples: int = 8,
) -> DataFrame:
    """Deterministic byte-offset sampling plan for frame extraction:
    one row per (id, offset) — the shape a video frame-sampler produces,
    computed as pure expressions (the decode of each offset is the stubbed
    stage).  [id, sample_idx, byte_offset]"""
    n = F.length(F.col(binary_col)).cast("long")
    count = F.least(F.lit(max_samples), F.greatest((n / every_n_bytes).cast("int"), F.lit(1)))
    idxs = F.sequence(F.lit(0), count - 1)
    return idf.select(
        F.col(id_col).alias("id"),
        F.posexplode(idxs).alias("sample_idx", "_i"),
    ).select(
        "id",
        "sample_idx",
        (F.col("_i").cast("long") * every_n_bytes).alias("byte_offset"),
    )
