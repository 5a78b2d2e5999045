"""Multimodal (image/audio/video) column plumbing.

Policy: media travel as opaque ``binary`` columns with typed metadata
structs beside them.  The Spark-side machinery — schema, Arrow-batched
mapInPandas, partition sizing — is real and tested.  Image decode /
resize run REAL bytes everywhere: PIL when importable, else the
dependency-free pure-python PNG codec (png_codec.py); only non-PNG
formats without PIL fall back to the clearly-flagged deterministic
fake.  Audio/video decode remain gated on their codec libraries
(_decode_audio stub pattern).

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


def _decode_audio(b: bytes) -> dict:
    """STUB: audio decode (soundfile/librosa not in this container).

    Production body: ``data, sr = soundfile.read(io.BytesIO(b))`` →
    duration/sample-rate/channels + feature-extract.  Image decode is NOT
    stubbed — see decode_images (PIL or the pure-python PNG codec)."""
    raise NotImplementedError("audio codec not available in this environment")


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


def decode_images(
    idf: DataFrame, binary_col: str, id_col: str, fake: bool = True
) -> DataFrame:
    """Image decode over a binary column → [id, width, height, mode,
    decoded, fake, pixel_sum, n_pixels].

    Codec ladder (fake=False): PIL when importable (full format
    coverage), else the dependency-free pure-python PNG codec
    (png_codec.decode_png — REAL bytes, all five scanline filters,
    gray/RGB/RGBA/palette).  Non-decodable blobs emit decoded=0.
    pixel_sum/n_pixels are the decoded-sample checksum the differential
    oracle replays in closed form.  fake=True keeps the deterministic
    md5-derived fake (schema-identical, pixel stats null) for plumbing
    tests on non-image bytes."""
    b_col, i_col = binary_col, id_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            try:
                import io

                from PIL import Image as _I

                def one(x):
                    if x is None:
                        return (None, None, None, 0, 0, None, None)
                    try:
                        img = _I.open(io.BytesIO(bytes(x)))
                        import numpy as _np

                        arr = _np.asarray(img, dtype="int64")
                        return (img.width, img.height, img.mode, 1, 0,
                                int(arr.sum()), int(arr.size))
                    except Exception:
                        return (None, None, None, 0, 0, None, None)

            except ImportError:
                from anovos_spark.operators.png_codec import PngError, decode_png

                def one(x):
                    if x is None:
                        return (None, None, None, 0, 0, None, None)
                    try:
                        w, h, mode, px = decode_png(bytes(x))
                        return (w, h, mode, 1, 0, sum(px), len(px))
                    except Exception:
                        return (None, None, None, 0, 0, None, None)

        else:

            def one(x):
                if x is None:
                    return (None, None, None, 0, 1, None, None)
                h = hashlib.md5(bytes(x)).digest()
                return (64 + h[0] % 192, 64 + h[1] % 192, "RGB", 1, 1, None, None)

        for pdf in batches:
            rows = [one(x) for x in pdf[b_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[i_col].astype("int64"),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mode": [r[2] for r in rows],
                    "decoded": [r[3] for r in rows],
                    "fake": [r[4] for r in rows],
                    "pixel_sum": pd.array([r[5] for r in rows], dtype="Int64"),
                    "n_pixels": pd.array([r[6] for r in rows], dtype="Int64"),
                }
            )

    return idf.select(i_col, b_col).mapInPandas(
        extract,
        schema=(
            "id long, width int, height int, mode string, decoded int, "
            "fake int, pixel_sum long, n_pixels long"
        ),
    )


def byte_histogram_features(
    idf: DataFrame, binary_col: str, id_col: str, n_bins: int = 16
) -> DataFrame:
    """REAL feature extraction with no codec dependency: the normalized
    byte-value histogram of each blob → [id, features array<double>].

    This is the baseline content signature for binary dedup/clustering
    (format-agnostic), and it exercises the exact batch shape a learned
    image/audio embedder would use — numpy over Arrow batches, fixed-width
    output vector."""
    import numpy as np

    b_col, i_col = binary_col, id_col
    width = 256 // n_bins

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for x in pdf[b_col]:
                if x is None or len(x) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                arr = np.frombuffer(bytes(x), dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=n_bins)[:n_bins]
                feats.append((hist / len(arr)).round(6).tolist())
            yield pd.DataFrame({"id": pdf[i_col].astype("int64"), "features": feats})

    return idf.select(i_col, b_col).mapInPandas(
        extract, schema="id long, features array<double>"
    )


def resize_images(
    idf: DataFrame,
    binary_col: str,
    id_col: str,
    target_w: int,
    target_h: int,
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing → [id, blob binary, width, height, fake].  With
    fake=False, blobs are decoded, nearest-neighbor resampled, and
    re-encoded as PNG at the target size — via PIL when importable, else
    the pure-python PNG codec (real bytes, fake=0).  The deterministic
    fake passes the original bytes through with the target dimensions
    stamped, keeping schema and batch shape production-true."""
    try:
        import io

        from PIL import Image as _I

        have_pil = True
    except ImportError:
        have_pil = False

    b_col, i_col = binary_col, id_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake and not have_pil:
            from anovos_spark.operators.png_codec import (
                decode_png,
                encode_png,
                resize_nearest,
            )
        for pdf in batches:
            out_blobs, fakes = [], []
            for x in pdf[b_col]:
                if x is None:
                    out_blobs.append(None)
                    fakes.append(1)
                elif not fake and have_pil:
                    img = _I.open(io.BytesIO(bytes(x))).resize((target_w, target_h))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out_blobs.append(buf.getvalue())
                    fakes.append(0)
                elif not fake:
                    try:
                        w, h, mode, px = decode_png(bytes(x))
                        ch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
                        rs = resize_nearest(px, w, h, ch, target_w, target_h)
                        out_blobs.append(encode_png(target_w, target_h, mode, rs))
                        fakes.append(0)
                    except Exception:
                        out_blobs.append(bytes(x))
                        fakes.append(1)
                else:
                    out_blobs.append(bytes(x))
                    fakes.append(1)
            yield pd.DataFrame(
                {
                    "id": pdf[i_col].astype("int64"),
                    "blob": out_blobs,
                    "width": target_w,
                    "height": target_h,
                    "fake": fakes,
                }
            )

    return idf.select(i_col, b_col).mapInPandas(
        extract, schema="id long, blob binary, width int, height int, fake int"
    )


def size_bucket_repartition(
    idf: DataFrame, binary_col: str, target_bytes_per_partition: int = 64 << 20
) -> DataFrame:
    """Repartition a blob table so each partition carries ~equal BYTES, not
    equal rows — the partitioning step the module docstring prescribes
    before decode when blob sizes are heavy-tailed.  Uses the running total
    of blob length bucketed by the target size as the shuffle key."""
    total = idf.select(F.sum(F.length(binary_col))).first()[0] or 0
    n_parts = max(1, round(total / target_bytes_per_partition))
    # round-robin spread: with n_parts sized from the true byte total,
    # per-partition bytes concentrate tightly around the target for any
    # iid size distribution; a single blob larger than the target can't be
    # split regardless, so finer policies buy nothing at this layer
    return idf.repartition(n_parts)


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
