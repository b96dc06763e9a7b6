"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side machinery — schema, partition sizing, UDF signatures, batch
shapes — is real and tested (tests/test_streaming.py::test_multimodal_pipeline,
::test_multimodal_audio_and_resize). The actual media
decode is STUBBED: the sandbox has no PIL/ffmpeg/torchvision, so
``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces a seeded fake decode
(content-hash-derived dimensions + per-pixel stats) so every downstream
stage is exercisable end-to-end. Swap ``_decode_real`` for a PIL/ffmpeg
call on a cluster with the libs installed — nothing else changes.

Scale notes: media blobs are orders of magnitude larger than text rows —
``media_repartition_bytes`` targets ~256 MB of blob per task so a single
executor never materializes more than a few batches of pixels;
``maxRecordsPerBatch`` should be lowered (e.g. 32) when row blobs are MBs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, sha256 string, "
    "mean_r double, mean_g double, mean_b double"
)


def _decode_real(blob: bytes) -> tuple[int, int, tuple[float, float, float]]:
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg — not present in this environment; "
        "use deterministic_fake=True for pipeline testing"
    )


def _fake_digest(blob: bytes) -> bytes:
    """Content digest for the fake decodes: sha256 of the LOWERCASE-HEX
    encoding of the blob (not the raw bytes) — DuckDB's sha256 only hashes
    VARCHAR, and hashing the hex string lets the driver-gate oracle
    recompute every fake feature engine-independently."""
    return hashlib.sha256(blob.hex().encode()).digest()


def _decode_fake(blob: bytes) -> tuple[int, int, tuple[float, float, float]]:
    """Seeded fake decode: dimensions and channel means derived from the
    content hash — deterministic, so downstream aggregates are testable."""
    h = _fake_digest(blob)
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    means = (h[2] / 255.0, h[3] / 255.0, h[4] / 255.0)
    return width, height, means


def image_features(
    media: DataFrame,
    deterministic_fake: bool = False,
    media_repartition_bytes: int = 256 << 20,
) -> DataFrame:
    """(media_id, width, height, n_bytes, sha256, mean_r/g/b) per image row.

    Pure plumbing demo of the decode → feature-extract stage: binary in,
    fixed-width features out, one Arrow crossing. ``media_repartition_bytes``
    caps blob bytes per task: partitions = ceil(total_blob_bytes / cap), so
    one skewed input split can't materialize gigabytes of pixels in a single
    worker (costs one sizing aggregate — skip with ``None``)."""
    decode = _decode_fake if deterministic_fake else _decode_real

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                w, hgt, (mr, mg, mb) = decode(b)
                # fake mode fingerprints the hex encoding (what _fake_digest
                # hashes) so the SQL oracle can recompute it; real mode
                # fingerprints the raw bytes (the ingest-invariant analog)
                fp = (
                    hashlib.sha256(b.hex().encode()) if deterministic_fake else hashlib.sha256(b)
                ).hexdigest()
                rows.append((media_id, w, hgt, len(b), fp, mr, mg, mb))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_bytes", "sha256",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    imgs = _byte_capped(
        media.filter(F.col("kind") == "image").select("media_id", "blob"),
        media_repartition_bytes,
    )
    return imgs.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n_seconds: int = 5
) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into one row per
    planned frame timestamp using the duration metadata — the explode stays
    JVM-side; only the (stubbed) frame decode would cross to Python.
    (media_id, frame_ts_sec)."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.coalesce(F.element_at("meta", "duration_sec").cast("int"), F.lit(0)).alias("dur"),
    )
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("dur") - 1, F.lit(0)), F.lit(every_n_seconds))).alias(
            "frame_ts_sec"
        ),
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for pipeline tests — built
    DISTRIBUTED (spark.range + JVM expressions), never as a driver-side
    row list: the gates size this table to the corpus, and a list of
    blob-carrying Python rows would pin O(corpus) driver memory. Values
    are identical to the original driver-side construction (blob =
    sha256("media{i}") digest repeated 4 + i%7 times; hex repetition ==
    byte repetition)."""
    i = F.col("media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (i % 3).cast("int") + 1,
    )
    blob = F.unhex(
        F.expr(
            "repeat(sha2(concat('media', cast(media_id as string)), 256), "
            "cast(4 + media_id % 7 as int))"
        )
    )
    meta = F.when(
        kind == "video",
        F.create_map(
            F.lit("duration_sec"), (F.lit(10) + i % 50).cast("string")
        ),
    ).otherwise(F.create_map().cast("map<string,string>"))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        blob.alias("blob"),
        meta.alias("meta"),
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, duration_ms long, n_bytes long, rms double"
)


def _audio_decode_fake(blob: bytes) -> tuple[int, int, float]:
    h = _fake_digest(blob)
    sample_rate = (8000, 16000, 44100, 48000)[h[0] % 4]
    duration_ms = 500 + int.from_bytes(h[1:3], "big") % 60_000
    rms = h[3] / 255.0
    return sample_rate, duration_ms, rms


def audio_features(
    media: DataFrame,
    deterministic_fake: bool = False,
    media_repartition_bytes: int = 256 << 20,
) -> DataFrame:
    """(media_id, sample_rate, duration_ms, n_bytes, rms) per audio row —
    the audio twin of image_features (same byte-capped repartition, one
    Arrow crossing; decode stubbed, seeded fake for pipeline tests)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                if not deterministic_fake:
                    raise NotImplementedError(
                        "audio decode requires ffmpeg/librosa — use "
                        "deterministic_fake=True for pipeline testing"
                    )
                sr, dur, rms = _audio_decode_fake(b)
                rows.append((media_id, sr, dur, len(b), rms))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "duration_ms", "n_bytes", "rms"]
            )

    auds = _byte_capped(
        media.filter(F.col("kind") == "audio").select("media_id", "blob"),
        media_repartition_bytes,
    )
    return auds.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, blob binary"


def image_resize(
    media: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    deterministic_fake: bool = False,
    media_repartition_bytes: int = 256 << 20,
) -> DataFrame:
    """Resize stage plumbing: binary in → (resized) binary out, fixed target
    dims. Fake path emits a deterministic content-hash-seeded blob of
    width*height bytes, so downstream stages see realistic row sizes; the
    real path is the PIL call."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image resize requires PIL — use deterministic_fake=True"
                    )
                seed = hashlib.sha256(b).digest()
                out = (seed * (target_width * target_height // len(seed) + 1))[
                    : target_width * target_height
                ]
                rows.append((media_id, target_width, target_height, out))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "blob"])

    imgs = _byte_capped(
        media.filter(F.col("kind") == "image").select("media_id", "blob"),
        media_repartition_bytes,
    )
    return imgs.mapInPandas(fn, RESIZED_SCHEMA)


def _byte_capped(df: DataFrame, cap_bytes: int | None) -> DataFrame:
    """Repartition so no task holds more than ~cap_bytes of blob."""
    if not cap_bytes:
        return df
    total = df.agg(F.sum(F.length("blob")).alias("b")).collect()[0]["b"] or 0
    n_parts = max(1, -(-int(total) // int(cap_bytes)))
    # estimate current split count from driver metadata (no .rdd conversion):
    # file-backed frames report their files; in-memory frames spread over
    # defaultParallelism slices
    src_parts = len(df.inputFiles()) or df.sparkSession.sparkContext.defaultParallelism
    if n_parts > src_parts:
        df = df.repartition(n_parts)
    return df


def crossmodal_topk(
    spark, media: DataFrame, embeddings: DataFrame, n_query_media: int = 4, k: int = 5
) -> DataFrame:
    """CLIP-style cross-modal retrieval plumbing: image → (stubbed) encoder
    → joint embedding space → cosine top-k against the embedding corpus —
    (query_media_id, rank, neighbor_id, cosine_micros).

    The "image tower" here is the deterministic fake encoder: the joint
    64-dim vector is the 32 bytes of the fake decode's content digest
    followed by the 32 bytes of its re-hash (a frozen random-but-stable
    projection, same stub contract as image_features). A real CLIP tower
    slots into the same collect point — queries are a bounded |Q|-row driver
    constant, exactly like ann_bruteforce_topk's.

    Scale shape: identical to the gated brute-force ANN — one corpus pass,
    per-Arrow-batch int64 matmul emitting only per-batch top-k per query, a
    final window over ≤ k·n_batches rows. Cosine is scale-invariant, so the
    byte-valued image vector and the micros-quantized text embeddings score
    on the shared (1e6·dot)/(√na·√nb) integer-micros tree.
    """
    import numpy as np
    from pyspark.sql import Window

    from searchengine_spark.operators.similarity import _micros_np, _quantize_np

    # query set derived STRUCTURALLY (first n_query_media image rows by
    # media_id), not via the 3*n arithmetic that duplicated make_fake_media's
    # kind-cycle layout — the oracle twin uses the same ORDER BY/LIMIT shape,
    # so a change to the fake-media layout can't desync the two sides
    q_media = (
        media.filter(F.col("kind") == "image")
        .orderBy("media_id")
        .limit(n_query_media)
    )
    feats = image_features(
        q_media,
        deterministic_fake=True,
        media_repartition_bytes=None,
    )
    q_rows = sorted(
        feats.select("media_id", "sha256").collect(), key=lambda r: r["media_id"]
    )
    if not q_rows:
        return spark.createDataFrame(
            [], "query_media_id long, rank int, neighbor_id long, cosine_micros long"
        )

    def _joint(hx: str) -> list[int]:
        return list(bytes.fromhex(hx)) + list(hashlib.sha256(hx.encode()).digest())

    q_ids = np.array([r["media_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([_joint(r["sha256"]) for r in q_rows], dtype=np.int64)
    qn = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy("int64")
            import numpy as _np

            C = _quantize_np(_np.stack(pdf["embedding"].to_numpy()))
            cn = _np.sqrt((C * C).sum(axis=1).astype(_np.float64))
            micros = _micros_np(
                (1e6 * (C @ Q.T).astype(_np.float64)) / (cn[:, None] * qn[None, :])
            )
            out = []
            for j, qid in enumerate(q_ids):
                sel = _np.lexsort((ids, -micros[:, j]))[: min(k, ids.size)]
                out.extend(
                    (int(qid), int(ids[i]), int(micros[i, j])) for i in sel
                )
            yield pd.DataFrame(
                out, columns=["query_media_id", "neighbor_id", "cosine_micros"]
            ).astype("int64")

    scored = embeddings.select("vec_id", "embedding").mapInPandas(
        fn, "query_media_id long, neighbor_id long, cosine_micros long"
    )
    w = Window.partitionBy("query_media_id").orderBy(
        F.desc("cosine_micros"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_media_id", "rank", "neighbor_id", "cosine_micros")
    )
