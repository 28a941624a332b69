"""Multimodal column handling: opaque binary payloads + typed metadata.

The model for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a pointer column to object storage) with typed
metadata alongside; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes cross the JVM/Python boundary once per batch,
never per row, and the operator composes with any upstream DataFrame
plan (predicate pushdown still prunes files before decode).

``decode_batch`` uses a DETERMINISTIC FAKE decoder (header-byte
arithmetic) behind the same batch shape a real codec would use — the
cross-engine-checkable oracle path. ``decode_real`` is a WORKING
image decode over the same plumbing: Pillow when importable, else the
repo's pure-Python PNG codec (pipeline/png.py — stdlib zlib, all five
scanline filters); invalid/unsupported payloads become format='invalid'
rows instead of failing the batch, the posture a 100 TB crawl corpus
requires (a single corrupt blob must never kill a stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: decode output schema — what a real image decoder would emit
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("format", StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the
    text — the testdata has no real media; the column TYPE and the
    downstream plumbing are what's real)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake/v1").alias("codec"),
            F.length(F.col(text_col)).cast("long").alias("declared_size"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a codec: 'width'/'height' are the
    first two header bytes, format tag from byte parity."""
    if not payload:
        return 0, 0, "empty"
    w = payload[0]
    h = payload[1] if len(payload) > 1 else 0
    fmt = "fake-a" if w % 2 == 0 else "fake-b"
    return w, h, fmt


def decode_batch(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode via mapInPandas: one Python roundtrip per
    ~10k-row batch, output rows aligned to DECODE_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (absent asset): metadata is unknown, not
            # zero — emit an all-NULL row (all-NULL-column sweep find:
            # len(None) crashed the whole batch)
            decoded = [
                _fake_decode(p) if p is not None else (None, None, None)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array(
                        [len(p) if p is not None else None
                         for p in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "width": pd.array(
                        [d[0] for d in decoded], dtype="Int64"
                    ),
                    "height": pd.array(
                        [d[1] for d in decoded], dtype="Int64"
                    ),
                    "format": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, DECODE_SCHEMA)


#: real-decode output schema: decode metadata + a real extracted
#: feature (mean luma) — what a training-data filter actually consumes
DECODE_REAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("format", StringType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def _decode_real_one(payload: bytes) -> tuple[int, int, int, str, float]:
    """(width, height, channels, format, mean_luma) via Pillow when
    available, else the pure-Python PNG codec. Anything undecodable
    returns an 'invalid' row."""
    try:
        from PIL import Image  # real codec if the env has it
        import io

        with Image.open(io.BytesIO(payload)) as im:
            px = im.convert("L")
            hist = px.histogram()
            total = sum(hist) or 1
            luma = sum(i * c for i, c in enumerate(hist)) / total
            return im.width, im.height, len(im.getbands()), im.format.lower(), luma
    except ImportError:
        pass
    except Exception:
        return 0, 0, 0, "invalid", 0.0
    from keenwa_spark.pipeline.png import PngError, decode_png

    try:
        w, h, ch, pixels = decode_png(payload)
    except PngError:
        return 0, 0, 0, "invalid", 0.0
    if w == 0 or h == 0:  # defense in depth; decode_png rejects these
        return 0, 0, 0, "invalid", 0.0
    if ch in (3, 4):  # Rec.601 luma over RGB(A) pixels
        luma = (
            sum(
                0.299 * pixels[i] + 0.587 * pixels[i + 1] + 0.114 * pixels[i + 2]
                for i in range(0, len(pixels), ch)
            )
            / (w * h)
        )
    else:  # grey / grey+alpha: first sample IS luma
        luma = sum(pixels[i] for i in range(0, len(pixels), ch)) / (w * h)
    return w, h, ch, "png", luma


def decode_real(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Working real-codec decode: same Arrow-batched mapInPandas shape
    as decode_batch, but payloads are actually decoded (Pillow if
    present, else pipeline/png.py) and a real feature (mean luma) is
    extracted from the pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_real_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([r[0] for r in rows], dtype="int64"),
                    "height": pd.Series([r[1] for r in rows], dtype="int64"),
                    "channels": pd.Series([r[2] for r in rows], dtype="int64"),
                    "format": [r[3] for r in rows],
                    "mean_luma": pd.Series([r[4] for r in rows], dtype="float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, DECODE_REAL_SCHEMA)


#: aHash output schema
AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def _ahash_one(payload: bytes) -> int | None:
    """64-bit average-hash of an image payload: decode, sample an 8x8
    luma grid (nearest-pixel), set bit (row*8+col) iff the cell is
    brighter than the grid mean. None for undecodable payloads."""
    from keenwa_spark.pipeline.png import PngError, decode_png

    try:
        w, h, ch, pixels = decode_png(payload)
    except PngError:
        return None
    if w == 0 or h == 0:
        return None

    def luma_at(x: int, y: int) -> float:
        i = (y * w + x) * ch
        if ch >= 3:
            return 0.299 * pixels[i] + 0.587 * pixels[i + 1] + 0.114 * pixels[i + 2]
        return float(pixels[i])

    grid = [
        luma_at(min((gx * w) // 8, w - 1), min((gy * h) // 8, h - 1))
        for gy in range(8)
        for gx in range(8)
    ]
    mean = sum(grid) / 64.0
    bits = 0
    for j, v in enumerate(grid):
        if v > mean:
            bits |= 1 << j
    # keep within signed int64 for Spark LongType
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def ahash_fingerprints(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ahash) per decodable image payload — the image-domain
    analog of simhash_fingerprints: near-duplicate images differ in few
    hash bits. One Arrow-batched decode pass; undecodable payloads are
    dropped (they can't be perceptually deduped)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [_ahash_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "ahash": hashes}
            )
            yield out[out["ahash"].notna()]

    return df.select(id_col, "payload").mapInPandas(run, AHASH_SCHEMA)


def ahash_near_dup_pairs(
    fingerprints: DataFrame, max_hamming: int = 3, max_bucket: int = 1000
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup pairs with hash hamming
    distance <= max_hamming — the same pigeonhole as banded
    MinHash-LSH: splitting 64 bits into 4 16-bit bands guarantees any
    pair within hamming 3 agrees on at least one band, so candidates
    come from per-(band, value) buckets, never an all-pairs crossing;
    the exact popcount verification (xor + bit_count, pure JVM)
    removes band false-positives.

    Same at-scale shape as dedup.minhash_lsh_pairs: ONE shuffle on the
    band key, per-bucket inline pair expansion with array lambdas
    (measured faster than a bucket self-join there), and a
    ``max_bucket`` viral-content guard — at 100 TB a single viral
    image (a logo, a tracking pixel) otherwise lands its whole copy
    set in one bucket and the pair output goes QUADRATIC in the copy
    count (the r13 100x probe's dup-heavy staging surfaced exactly
    this); buckets wider than the cap are dropped, which also bounds
    the collected member lists."""
    if not 0 <= max_hamming <= 3:
        # 4 bands of 16 bits pigeonhole-guarantee a shared band only
        # up to hamming 3; a larger threshold would silently miss
        # qualifying pairs, so reject it loudly
        raise ValueError(
            f"max_hamming must be in [0, 3] for the 4x16-bit banding, "
            f"got {max_hamming}"
        )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> "
        "struct(x.doc_id AS id_a, y.doc_id AS id_b, "
        "bit_count(x.ahash ^ y.ahash) AS hamming))))"
    )
    bucketed = _ahash_band_buckets(fingerprints)
    return (
        bucketed.filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _ahash_band_buckets(fingerprints: DataFrame) -> DataFrame:
    """(band, val, ids) — every 16-bit-band bucket with its sorted
    member list, BEFORE the ``max_bucket`` cap filter. Shared by the
    pair generator and the skew instrumentation so both see the
    identical bucket population."""
    bands = fingerprints.select(
        F.col("doc_id"),
        F.col("ahash"),
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> "
                "named_struct('band', b, 'val', (ahash >> (b * 16)) & 65535))"
            )
        ).alias("bv"),
    ).select("doc_id", "ahash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    return bands.groupBy("band", "val").agg(
        F.sort_array(F.collect_set(F.struct("doc_id", "ahash"))).alias("ids")
    )


def ahash_bucket_stats(fingerprints: DataFrame) -> DataFrame:
    """Skew diagnostics for the aHash band-bucket population (r14,
    VERDICT r13 item 8): one row (max_bucket_seen, n_buckets,
    n_over_default_cap) measured BEFORE ``ahash_near_dup_pairs``'s
    viral-bucket cap, so the cap's headroom at growing scale is
    tracked instead of assumed. Untimed diagnostics only."""
    b = _ahash_band_buckets(fingerprints)
    return b.agg(
        F.max(F.size("ids")).alias("max_bucket_seen"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.size("ids") > 1000).cast("long")).alias("n_over_default_cap"),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling SHAPE: given per-frame rows, keep
    every n-th frame per asset — pure DataFrame ops (window + modulo),
    demonstrating that sampling logic needs no Python even when decode
    does."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    return (
        df.withColumn("frame_idx", F.row_number().over(w) - 1)
        .filter(F.col("frame_idx") % every_n == 0)
    )


#: resize output schema: resized raw pixel buffer + its geometry
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_width", LongType()),
        StructField("src_height", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixels", BinaryType()),
    ]
)


def _resize_one(
    payload: bytes, out_w: int, out_h: int
) -> tuple[int, int, int, bytes] | None:
    """Nearest-neighbor resample of a PNG payload to (out_w, out_h):
    output pixel (x, y) copies source pixel (x*sw//out_w, y*sh//out_h)
    — the standard integer-exact NN mapping, deterministic on every
    engine. None for undecodable payloads."""
    from keenwa_spark.pipeline.png import PngError, decode_png

    try:
        w, h, ch, pixels = decode_png(payload)
    except PngError:
        return None
    if w == 0 or h == 0:
        return None
    out = bytearray(out_w * out_h * ch)
    for y in range(out_h):
        sy = (y * h) // out_h
        row = sy * w
        for x in range(out_w):
            si = (row + (x * w) // out_w) * ch
            di = (y * out_w + x) * ch
            out[di : di + ch] = pixels[si : si + ch]
    return w, h, ch, bytes(out)


def resize_images(
    df: DataFrame, out_w: int = 8, out_h: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Batch image resize (the training-data thumbnail/normalize step):
    real PNG decode + nearest-neighbor resample per payload, one
    Arrow-batched mapInPandas pass — same sanctioned Python-boundary
    shape as decode_real. Output: raw ``channels``-interleaved pixel
    bytes of the (out_w x out_h) image plus source geometry;
    undecodable payloads are dropped. Embarrassingly parallel: no
    shuffle, composes after any pushdown-pruned scan."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"output dims must be positive, got {out_w}x{out_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                r = _resize_one(p, out_w, out_h)
                if r is not None:
                    rows.append((int(i), r[0], r[1], out_w, out_h, r[2], r[3]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "width", "height", "channels", "pixels",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(run, RESIZE_SCHEMA)


#: per-frame output schema of the video decode path
FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_crc", LongType()),
    ]
)


def explode_video_frames(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One row per (asset, frame): REAL YUV4MPEG2 decode via the
    pure-Python codec (pipeline/y4m.py — header parse + per-FRAME
    planar extraction, C420/C422/C444/Cmono), the video face of the
    multimodal layer. Emits each frame's geometry, planar byte count,
    and crc32 of the raw YCbCr planes; payloads that are not a Y4M
    stream this codec supports are DROPPED (same contract as the PNG
    decode path — corrupt assets don't poison the batch). Arrow-batched
    mapInPandas, no shuffle: decode parallelism is scan parallelism. A
    compressed-codec binding (pyav/ffmpeg) would slot in beside
    decode_y4m with no change to the Spark plumbing."""
    import zlib

    from keenwa_spark.pipeline.y4m import Y4MError, decode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                if p is None:
                    continue
                try:
                    hdr, frames = decode_y4m(bytes(p))
                except Y4MError:
                    continue
                for idx, fb in enumerate(frames):
                    rows.append(
                        (
                            int(i), idx, hdr["width"], hdr["height"],
                            len(fb), zlib.crc32(fb) & 0xFFFFFFFF,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "frame_bytes", "frame_crc",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(run, FRAMES_SCHEMA)


#: audio feature schema
PCM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def pcm_features(
    df: DataFrame, sample_rate: int = 8000, id_col: str = "doc_id"
) -> DataFrame:
    """Audio feature extraction over raw PCM: interprets the payload as
    signed 8-bit mono samples (the testdata carries no real audio — the
    INTERPRETATION is the stand-in; the features are real DSP: RMS
    level and zero-crossing count, the two cheapest speech/music/noise
    discriminators). Arrow-batched via numpy — one Python crossing,
    vectorized inside."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                s = np.frombuffer(p, dtype=np.int8).astype(np.float64)
                n = len(s)
                if n == 0:
                    rows.append((int(i), 0, 0.0, 0.0, 0))
                    continue
                rms = float(np.sqrt(np.mean(s * s)))
                zc = int(np.count_nonzero(np.diff(np.signbit(s))))
                rows.append((int(i), n, n / sample_rate, rms, zc))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "duration_s", "rms", "zero_crossings"],
            )

    return df.select(id_col, "payload").mapInPandas(run, PCM_SCHEMA)
