"""Multimodal column support (driver-contract extension).

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata, exactly as a 100 TB multimodal corpus stores them. The Spark
plumbing — schemas, Arrow-batched mapInPandas decode operators, batch
shapes, partitioning — is real and tested, and since round 10 so is the
image decode:

- `decode_image` is a real codec: PIL when importable (any format),
  else a stdlib zlib PNG codec for the 8-bit grayscale profile
  (`png_encode_gray`/`png_decode_gray`) — exercised end-to-end and
  oracle-certified by `multimodal_image_decode_resize`;
- audio/video decoding stays faked (`fake_decode_features`/
  `fake_frame_sample` are deterministic fakes over the identical Arrow
  path — no ffmpeg in this environment).

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


def _png_codec():
    """Minimal PNG codec for the 8-bit grayscale non-interlaced profile:
    stdlib struct + zlib framing, numpy for the scanline math where
    importable (pure-stdlib per-pixel loop otherwise — identical bytes,
    property-pinned). Factory-local definitions on purpose: a
    `<locals>` qualname makes cloudpickle serialize these BY VALUE, so
    mapInPandas closures can call them on executors that don't have this
    package on sys.path (the repo-wide closure-serialization rule)."""
    import struct
    import zlib

    try:
        import numpy as _np
    except ImportError:  # pragma: no cover - numpy is baked in
        _np = None

    SIG = b"\x89PNG\r\n\x1a\n"

    def encode(raster: bytes, width: int, height: int) -> bytes:
        """Encode a gray-8 raster as a real, spec-valid PNG (filter 0
        rows, fixed zlib level -> deterministic bytes)."""
        if len(raster) != width * height:
            raise ValueError(
                f"raster is {len(raster)} bytes, expected {width * height}"
            )

        def chunk(tag: bytes, data: bytes) -> bytes:
            body = tag + data
            return (
                struct.pack(">I", len(data))
                + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        if _np is not None:
            # one reshape + one column insert instead of a per-scanline
            # join loop (same bytes: filter-0 rows)
            rows = _np.zeros((height, width + 1), dtype=_np.uint8)
            rows[:, 1:] = _np.frombuffer(raster, dtype=_np.uint8).reshape(
                height, width
            )
            raw = rows.tobytes()
        else:
            raw = b"".join(
                b"\x00" + raster[y * width : (y + 1) * width] for y in range(height)
            )
        return (
            SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )

    def unfilter_np(raw: bytes, width: int, height: int) -> bytes:
        """Vectorized scanline reconstruction (r10 verdict item 4: the
        per-pixel Python loop was the sf1 floor of the decode bench).
        Filter math in numpy uint8 is exact mod-256 arithmetic:
        None = copy, Sub = within-row wrapping cumsum, Up = wrapping
        add of the previous reconstructed row. Average/Paeth keep the
        per-pixel loop (the reconstructed LEFT neighbour makes them
        inherently sequential in x) — they only appear in
        foreign-encoder output, never in `encode`'s filter-0 rows, and
        the all-zero batch fast path returns in one reshape."""
        arr = _np.frombuffer(raw, dtype=_np.uint8).reshape(height, width + 1)
        ftypes = arr[:, 0]
        data = arr[:, 1:]
        if not ftypes.any():  # all filter 0 — `encode`'s own profile
            return data.tobytes()
        if int(ftypes.max()) > 4:
            raise ValueError(f"unknown PNG filter type {int(ftypes.max())}")
        out = _np.empty((height, width), dtype=_np.uint8)
        prev = _np.zeros(width, dtype=_np.uint8)
        for y in range(height):
            ft = int(ftypes[y])
            row = data[y]
            if ft == 0:
                cur = row
            elif ft == 1:  # Sub: recon[x] = sum(raw[0..x]) mod 256
                cur = _np.cumsum(row, dtype=_np.uint8)
            elif ft == 2:  # Up: uint8 add wraps mod 256
                cur = row + prev
            else:  # Average/Paeth: sequential left-neighbour recurrence
                cur = _np.empty(width, dtype=_np.uint8)
                a = 0
                pv = prev.tolist()
                rw = row.tolist()
                for x in range(width):
                    b = pv[x]
                    c = pv[x - 1] if x else 0
                    if ft == 3:
                        v = (rw[x] + (a + b) // 2) & 0xFF
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = (
                            a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                        )
                        v = (rw[x] + pred) & 0xFF
                    cur[x] = v
                    a = v
            out[y] = cur
            prev = out[y]
        return out.tobytes()

    def decode(payload: bytes) -> tuple[int, int, bytes]:
        """Decode a gray-8 non-interlaced PNG to (width, height, raster).
        All five spec filters (None/Sub/Up/Average/Paeth) are
        reconstructed, so PNGs from other encoders (PIL writes Paeth
        rows) decode too — this is a complete decoder for the profile,
        not just an inverse of `encode`."""
        if payload[:8] != SIG:
            raise ValueError("not a PNG payload")
        width = height = None
        idat = b""
        pos = 8
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if tag == b"IHDR":
                width, height, depth, color, _, _, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if (depth, color, interlace) != (8, 0, 0):
                    raise ValueError(
                        "only 8-bit grayscale non-interlaced PNGs "
                        f"(got depth={depth} color={color} interlace={interlace})"
                    )
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + length
        if width is None or not idat:
            raise ValueError("truncated PNG (no IHDR/IDAT)")
        raw = zlib.decompress(idat)
        if len(raw) != height * (width + 1):
            raise ValueError("PNG scanline data has the wrong length")
        if _np is not None:
            return width, height, unfilter_np(raw, width, height)
        out = bytearray()
        prev = bytes(width)
        for y in range(height):
            ftype = raw[y * (width + 1)]
            row = bytearray(raw[y * (width + 1) + 1 : (y + 1) * (width + 1)])
            if ftype > 4:
                raise ValueError(f"unknown PNG filter type {ftype}")
            if ftype == 0:  # None: no per-pixel reconstruction needed —
                out += row  # the hot path for our own encoder's output
                prev = row
                continue
            for x in range(width):
                a = row[x - 1] if x else 0  # reconstructed left neighbour
                b = prev[x]
                c = prev[x - 1] if x else 0
                if ftype == 1:
                    row[x] = (row[x] + a) & 0xFF
                elif ftype == 2:
                    row[x] = (row[x] + b) & 0xFF
                elif ftype == 3:
                    row[x] = (row[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    row[x] = (row[x] + pred) & 0xFF
            out += row
            prev = row
        return width, height, bytes(out)

    return encode, decode


png_encode_gray, png_decode_gray = _png_codec()


def pil_available() -> bool:
    """Import-guard for the PIL decode path (avro/iceberg discipline:
    only module-absent maps to False; a broken PIL propagates)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        return False
    return True


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Real image decode to (width, height, gray-8 raster bytes) — the
    deploy slot that was a NotImplementedError stub through round 9.
    PIL when importable (any format, converted to 8-bit grayscale);
    otherwise the stdlib zlib PNG decoder covering the gray-8
    non-interlaced profile `png_encode_gray` emits. Only ImportError
    routes to the fallback (ADVICE r9: a broken probe must not
    masquerade as 'module absent')."""
    try:
        from PIL import Image
    except ImportError:
        return png_decode_gray(payload)
    import io

    with Image.open(io.BytesIO(payload)) as img:
        gray = img.convert("L")
        return gray.width, gray.height, gray.tobytes()


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
    from ..catalog import widen_if_narrow

    # widen the narrow single-row-group scan first (r11; the md5 chain
    # + interpreted window HOFs otherwise run 2-wide — 5.5 -> ~1 s at
    # sf1; no-op on a real split-able corpus)
    d = widen_if_narrow(spark, load_table(spark, sf_dir, "documents"))
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


def _resize_payload_frame(
    spark: SparkSession,
    sf_dir: str,
    widen_min_bytes: int | None = None,
    widen_split_bytes: int | None = None,
) -> DataFrame:
    """(doc_id, payload) with the synthesized 256-byte raster: 16
    chained md5 blocks — the documents table ships no real rasters;
    same convention as the other multimodal payloads. A real corpus
    reads this column straight from parquet `binary`.

    widen_min_bytes (non-None) repartitions the NARROW doc_id frame to
    the session's default parallelism BEFORE synthesizing the payload:
    the documents parquet at bench scale opens as ~2 splits, so
    everything downstream of the scan — the 16-md5 chain AND any
    per-row Python codec — otherwise runs 2-wide on a 32-core session.
    The exchange carries the chain inputs (doc_id + text, ~300 B/row —
    the 16-md5 chain itself runs post-shuffle at full width). The
    value is the widen_if_narrow cost statement: the codec-bearing
    decode_resize passes 0 (per-row Python PNG work dwarfs the
    exchange at every SF — measured 6.3 -> 1.5 s at sf1); the
    JVM-only resize passes the default threshold so the ~0.25 MB
    pruned sf0.1 frame skips the exchange (it measurably lost there,
    the pipeline_ccnet precedent) while the ~2.5 MB sf1 frame still
    widens (2.55 -> ~1.1 s warm). A real binary corpus has
    maxPartitionBytes-sized splits and skips this either way.

    r18 (guide §2.6 stragglers): the codec path passes
    widen_split_bytes so its width is SIZE-SCALED instead of a flat
    jump to default parallelism — the PNG codec measures 0.03 ms/row,
    so at bench SF a 32-task Python stage is ~30 ms of compute per
    task wrapped in 32 draws against bursty host contention (the r17
    driver pair saw the 32-core run LOSE to the 8-core run, in-run
    spread 3.69); the sf0.1 frame now widens to 4 tasks while sf1+
    still saturates at defaultParallelism (the 6.3 -> 1.5 s win there
    is untouched). The JVM-only resize keeps the flat jump (its
    md5-chain work is the heavy part and it only widens on MB-scale
    frames anyway)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if widen_min_bytes is not None:
        from ..catalog import widen_if_narrow

        d = widen_if_narrow(
            spark, d, min_bytes=widen_min_bytes, split_bytes=widen_split_bytes
        )
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
    driver-contract Part C.

    Widened (r12): the last unwidened member of the r11 scan-width
    finding — the 16-md5 synthesis chain plus the Arrow resize ran
    2-wide on the single-row-group bench parquet. Unlike the
    Python-codec decode_resize sibling (min_bytes=0), this JVM-only
    chain keeps the default MB gate: the exchange lost at sf0.1 and
    wins at sf1 (2.55 -> ~1.1 s warm) — see _resize_payload_frame. No-op on split-able corpora."""
    return image_resize_arrow_on(
        _resize_payload_frame(spark, sf_dir, widen_min_bytes=2 * 1024 * 1024)
    )


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
            # fail loudly per-row: the concat+reshape below only errors
            # if the batch TOTAL isn't a multiple of 256, so one
            # wrong-length payload would otherwise silently mis-frame
            # every later row in the batch (ADVICE r9)
            lens = pdf["payload"].map(len)
            if not lens.eq(IMG_W * IMG_W).all():
                bad = pdf["doc_id"][lens != IMG_W * IMG_W].iloc[0]
                raise ValueError(
                    f"payload for doc_id={bad} is not {IMG_W * IMG_W} bytes"
                )
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


def multimodal_image_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG encode -> decode_image -> block-mean resize, end to end in
    ONE Arrow batch pass (1 row -> 1 row, zero shuffle): the synthetic
    16x16 raster is encoded as a real spec-valid grayscale PNG, decoded
    back through the decode_image slot (PIL where importable, the
    stdlib zlib PNG decoder otherwise), then 2x2 box-filter downsampled
    exactly as multimodal_image_resize. The codec roundtrip is lossless,
    so the oracle is the resize SQL verbatim — hash equality proves the
    decoder returned the raster byte-for-byte, making the decode path a
    driver-certified operator instead of a stub. A real corpus swaps
    the synthesized PNG for its parquet `binary` column; the batch
    shape and decoder call are identical. Reference parity: none (no
    multimodal surface in the reference) — driver-contract Part C."""

    def decode_resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # closure, not a module function (executors lack this package);
        # png_* are factory-locals so cloudpickle ships them by value
        import numpy as np

        # probe PIL ONCE per task, not per row: a FAILED import is not
        # cached in sys.modules, so a per-row try-import re-scans
        # sys.path every call — measured 42 us/row, more than the whole
        # PNG codec (r11; was the largest single cost of this query)
        try:
            from PIL import Image

            import io

            def _decode(png: bytes) -> bytes:
                with Image.open(io.BytesIO(png)) as img:
                    return img.convert("L").tobytes()

        except ImportError:

            def _decode(png: bytes) -> bytes:
                return png_decode_gray(png)[2]

        for pdf in it:
            rasters = [
                _decode(png_encode_gray(p, IMG_W, IMG_W)) for p in pdf["payload"]
            ]
            if not all(len(r) == IMG_W * IMG_W for r in rasters):
                raise ValueError("decoded raster has the wrong length")
            raw = (
                np.frombuffer(b"".join(rasters), dtype=np.uint8)
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

    return _resize_payload_frame(
        spark, sf_dir, widen_min_bytes=0, widen_split_bytes=64 * 1024
    ).mapInPandas(decode_resize, schema=RESIZE_SCHEMA)


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
    "multimodal_image_decode_resize": multimodal_image_decode_resize,
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
    # the codec roundtrip is lossless, so decode+resize shares the
    # resize oracle verbatim — hash equality certifies the decoder
    "multimodal_image_decode_resize": IMAGE_RESIZE_SQL,
    # promoted round 6 (held out of the full round-5 window; pinned by
    # tests/test_llm.py::test_audio_windows_matches_oracle at both SFs)
    "multimodal_audio_windows": AUDIO_WINDOWS_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    "multimodal_join_docs_embeddings": MULTIMODAL_JOIN_SQL,
}
