"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures — is real and tested. Since r6 ``decode_image`` is a REAL
pure-numpy decoder for the uncompressed formats (binary PPM "P6" and
uncompressed 24/32-bit BMP — header parse + ``np.frombuffer``, no codec
library involved), and ``extract_features(stub=False)`` computes features
over the decoded pixels end-to-end. Compressed formats (JPEG/PNG/...)
still need PIL/ffmpeg, which this container does not ship — those raise
``ValueError`` from the same function, and swapping in a full codec
keeps every plan unchanged. ``stub=True`` (the gate path) remains the
deterministic byte-histogram fake over the raw payload so the DuckDB
oracle can replay it.

Layout follows the reference's embedded-resource model (binary bodies keyed
by digest, reference nodes.py:100, helper.py:85-127): blobs are hashed
early and joins ship hashes, never payloads (SURVEY.md §7.3 point 6).

DIGEST DOMAIN CONTRACT: ``payload_hex_sha256`` (and the ``source_hex_sha256`` it
feeds in frame sampling) is sha256 over the LOWERCASE-HEX ENCODING of the
payload, not over the raw bytes — SQL engines' sha256 (the oracle dialect
included) is VARCHAR-only, and hex is bijective with the bytes so dedup /
join semantics are unchanged. An external system computing a raw-byte blob
digest will NOT match this column; re-digest as
``sha256(payload.hex().encode())`` to interoperate. All in-repo consumers
(``sample_frames``, ``media_dedup``, the media gate oracles) share this
domain."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        # sha256 over the lowercase-hex ENCODING of payload (see the
        # digest-domain contract in the module docstring)
        T.StructField("payload_hex_sha256", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def payload_bytes(i: int, seed: int = 42) -> bytes:
    """Payload for media row ``i``: the first ``64 + i % 192`` bytes of the
    md5 chain md5(f"{seed}:{i}:0") || md5(f"{seed}:{i}:1") || ... — chosen
    over an RNG stream precisely so a SQL oracle can replay it
    (DuckDB: md5('42:5:0') || md5('42:5:1') ... -> from_hex)."""
    size = 64 + i % 192
    blocks = (size + 15) // 16
    raw = b"".join(
        hashlib.md5(f"{seed}:{i}:{j}".encode()).digest() for j in range(blocks)
    )
    return raw[:size]


def synthesize_media(spark, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (binary payload derived from the id)
    for exercising the plumbing at any scale — distributed generation."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                mtype = ["image", "audio", "video"][int(i) % 3]
                payload = payload_bytes(int(i), seed)
                rows.append(
                    {
                        "media_id": f"m{int(i):08d}",
                        "doc_id": f"doc-{int(i) % max(1, n // 4):08d}",
                        "media_type": mtype,
                        "payload": payload,
                        "width": 64 if mtype == "image" else None,
                        "height": 64 if mtype == "image" else None,
                        "duration_ms": 1000 * (int(i) % 30) if mtype != "image" else None,
                        # digest over the lowercase-hex encoding (bijective
                        # with the bytes): SQL engines' sha256 is
                        # VARCHAR-only, so this keeps the content digest
                        # replayable by the DuckDB oracle
                        "payload_hex_sha256": hashlib.sha256(
                            payload.hex().encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Pure-numpy image decode for uncompressed formats; returns an
    (H, W, 3) uint8 RGB array.

      * binary PPM ("P6", maxval <= 255): token header (whitespace +
        '#'-comment grammar) then raw RGB samples.
      * BMP ("BM", BITMAPINFOHEADER-family, biCompression == BI_RGB,
        24/32 bpp): bottom-up row order flipped to top-down, BGR(A)
        reordered to RGB, 4-byte row padding stripped.

    Anything else — compressed formats included — raises ``ValueError``
    (the reference's codec-failure analogue; a PIL-backed build would
    extend exactly this function)."""
    if payload[:2] == b"P6":
        toks: list[bytes] = []
        pos = 2
        n = len(payload)
        while len(toks) < 3:
            while pos < n and payload[pos : pos + 1].isspace():
                pos += 1
            if pos < n and payload[pos : pos + 1] == b"#":
                while pos < n and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            if start == pos:
                raise ValueError("ppm: truncated header")
            toks.append(payload[start:pos])
        pos += 1  # single whitespace after maxval, then raster
        try:
            w, h, maxval = (int(t) for t in toks)
        except ValueError as e:
            raise ValueError("ppm: non-integer header token") from e
        if w <= 0 or h <= 0 or not 0 < maxval <= 255:
            raise ValueError("ppm: unsupported dimensions/maxval")
        need = w * h * 3
        raster = payload[pos : pos + need]
        if len(raster) < need:
            raise ValueError("ppm: truncated raster")
        return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("bmp: truncated header")
        pix_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if compression != 0 or bpp not in (24, 32):
            raise ValueError("bmp: only uncompressed 24/32-bit supported")
        if w <= 0 or h == 0:
            raise ValueError("bmp: unsupported dimensions")
        top_down = h < 0
        h = abs(h)
        nchan = bpp // 8
        stride = (w * nchan + 3) & ~3
        need = stride * h
        if len(payload) < pix_off + need:
            raise ValueError("bmp: truncated pixel data")
        rows = np.frombuffer(
            payload[pix_off : pix_off + need], dtype=np.uint8
        ).reshape(h, stride)[:, : w * nchan].reshape(h, w, nchan)
        if not top_down:
            rows = rows[::-1]
        return rows[:, :, 2::-1].copy()  # BGR(A) -> RGB
    raise ValueError("unsupported image format (only P6 PPM / BI_RGB BMP)")


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Inverse helper for tests/synthesis: (H, W, 3) uint8 -> binary P6."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def extract_features(media: DataFrame, stub: bool = True) -> DataFrame:
    """Per-blob feature vector via mapInPandas (Arrow-batched binary in,
    array<float> out). With ``stub=True`` (the oracle-replayable gate
    path) the 'decoder' is a deterministic byte-histogram fake over the
    raw payload; ``stub=False`` really decodes (pure-numpy PPM/BMP,
    ``decode_image``) and histograms the PIXELS — undecodable payloads
    then raise ValueError, matching a codec failure."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("hist", T.ArrayType(T.IntegerType()), True),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def fx(batches):
        for pdf in batches:
            feats = []
            hists = []
            for payload in pdf["payload"]:
                if stub:
                    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                else:
                    arr = decode_image(bytes(payload)).reshape(-1)
                # bin width 256/FEATURE_DIM=16 == the high hex nibble of
                # each byte, which is what lets a SQL oracle replay the
                # histogram from the payload's hex representation
                hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                v = hist.astype(np.float32)
                n = float(np.linalg.norm(v))
                hists.append(hist.astype(np.int32).tolist())
                feats.append((v / n if n else v).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "hist": hists,
                    "feature": feats,
                }
            )

    return media.mapInPandas(fx, out_schema)


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (explode on a JVM-computed sequence; the decode of the actual
    frame is the same stubbed codec)."""
    v = media.filter(F.col("media_type") == "video")
    ts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
        F.lit(every_ms).cast("long"),
    )
    return v.select(
        "media_id",
        "doc_id",
        F.explode(ts).alias("frame_ms"),
        F.col("payload_hex_sha256").alias("source_hex_sha256"),
    )


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact blob dedup by payload digest (hash early, ship hashes)."""
    return media.groupBy("payload_hex_sha256").agg(
        F.count("*").cast("long").alias("n_blobs"),
        F.min("media_id").alias("keeper"),
    )
