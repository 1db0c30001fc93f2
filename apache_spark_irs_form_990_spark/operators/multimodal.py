"""Multimodal columns (SURVEY.md §2 B10 `mm_column_struct`): image /
audio / video payloads as opaque ``binary`` columns with typed metadata
structs, plus the decode / feature-extract / frame-sample plumbing as
Arrow-batched Pandas operators.

The container has no image/audio libraries, so the decode kernels are
STUBS — a deterministic fake derived from the payload bytes, clearly
marked, swappable for PIL/ffmpeg kernels. What IS real and tested is
everything Spark-side: the schema (binary + metadata struct), the
mapInPandas batch shapes, the metadata-only pushdown path, and the
partitioning story (payload bytes never shuffle for metadata queries).

Scale notes: at 100 TB of media, the whole game is (1) never moving
payload bytes you don't need — metadata filters/projects run off the
struct columns and parquet prunes the binary column entirely; (2)
decoding inside the scan task via mapInPandas, so decoded features,
not raw media, hit the first shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table from `documents`: payload =
    utf-8 bytes of text (a deterministic stand-in for image bytes),
    metadata struct = (mime, n_bytes, kind). In production this is
    `spark.read.format('binaryFile')` or a parquet table with a real
    binary column — schema identical."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            kind.alias("kind"),
        ).alias("meta"),
    )


@register(
    "mm_column_struct",
    oracle="""
    SELECT doc_id,
           'application/x-fake-' ||
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS mime,
           octet_length(CAST(text AS BLOB)) AS n_bytes
    FROM documents
    WHERE CAST(doc_id % 3 AS INT) = 0 AND octet_length(CAST(text AS BLOB)) > 200
    """,
)
def mm_column_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only query over the multimodal table: filter + project
    on the struct, payload column dropped. In the physical plan the
    binary column is pruned at the scan — the 100 TB payload never
    leaves disk for this query."""
    m = media_table(spark, sf_dir)
    return (
        m.filter((F.col("meta.kind") == "image") & (F.col("meta.n_bytes") > 200))
        .select("doc_id", F.col("meta.mime").alias("mime"), F.col("meta.n_bytes").alias("n_bytes"))
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB image decode — deterministic fake (width, height, channels)
    derived from the payload, NOT a real decoder. This is the ORACLE
    kernel: its SQL twin re-derives the byte-fold exactly, which is
    what keeps `mm_decode_features` hash-checked end-to-end."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 1_000_003
    return (64 + h % 1024, 64 + (h // 1024) % 1024, 3)


def _decode_pil(payload: bytes) -> tuple[int, int, int]:
    """Real image decode via Pillow (only reachable when PIL imports —
    see `_pick_decoder`). Same contract as the stub: bytes in, small
    typed tuple out; everything Spark-side is unchanged."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return (img.width, img.height, len(img.getbands()))


def _pick_decoder(kernel: str = "stub"):
    """Kernel selection: 'stub' (default; the deterministic oracle
    path), or 'pil' for the Pillow-backed real decoder — selected only
    when the library is importable, so the engine degrades to the stub
    on imageless workers instead of failing the job."""
    if kernel == "pil":
        try:
            import PIL  # noqa: F401

            return _decode_pil
        except ImportError:
            return _decode_stub
    return _decode_stub


def decode_features(media: DataFrame, kernel: str = "stub") -> DataFrame:
    """mapInPandas decode: payload batches in, per-item feature rows
    out. Arrow moves the binary column zero-copy into pandas; the
    decode runs inside the scan task (no payload shuffle)."""
    decode = _pick_decoder(kernel)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda t: t[0]),
                    "height": dims.map(lambda t: t[1]),
                    "channels": dims.map(lambda t: t[2]),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, width int, height int, channels int, n_bytes long"
    )


@register(
    "mm_decode_features",
    # The decode kernel is a stub, but a DETERMINISTIC one — so the
    # oracle re-derives it in SQL (byte-fold over the first 64 payload
    # bytes; payloads are ASCII here, so ord(char) == byte) and the
    # whole mapInPandas plumbing is hash-checked, not just row-counted.
    oracle="""
    WITH codes AS (
      SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
             list_reduce(
               [CAST(0 AS BIGINT)] ||
                 [CAST(ord(substr(text, i, 1)) AS BIGINT)
                  FOR i IN generate_series(1, least(64, len(text)))],
               (acc, b) -> (acc * 131 + b) % 1000003) AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(64 + h % 1024 AS INT) AS width,
           CAST(64 + (h // 1024) % 1024 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           n_bytes
    FROM codes
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode(payload) -> typed features via Arrow-batched mapInPandas.
    The kernel is the documented stub; the plumbing (batch iteration,
    schema, zero-copy binary transfer) is the real operator."""
    return decode_features(media_table(spark, sf_dir))


@register(
    "mm_frame_sample",
    # The frame sampler is a stub, but a DETERMINISTIC one: video
    # payloads are the utf-8 document text, each frame is a 16-CHARACTER
    # slice fingerprinted over its utf-8 bytes, and the emitted columns
    # are the frame's md5 fingerprint + byte length — all re-derivable
    # in SQL (both engines char-slice, then hash/measure the encoded
    # bytes), so the mapInPandas UDTF shape (one row in, k frame rows
    # out) is hash-checked end-to-end and stays byte-exact even for
    # multi-byte text (this DuckDB build has no BLOB substr, so a pure
    # byte slice cannot be mirrored; the char-slice contract can).
    # Videos are doc_id % 3 == 2 (media_table's kind assignment).
    oracle="""
    WITH vids AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
    )
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           md5(substr(text, CAST(i * 16 + 1 AS INT), 16)) AS frame_fp,
           CAST(octet_length(encode(substr(text, CAST(i * 16 + 1 AS INT), 16)))
                AS INT) AS frame_len
    FROM vids, LATERAL (SELECT unnest(generate_series(0, n_bytes % 4)) AS i)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: one row in, k frame rows out
    (UDTF shape). Frame count is a deterministic fake of n_bytes; a
    real implementation replaces the inner loop with ffmpeg keyframe
    extraction — the explode/flatMap contract is unchanged. Frames are
    emitted as md5 fingerprint + byte length (not raw binary): the
    stable, hashable form any downstream dedup/verify step wants, and
    the form a cross-engine oracle can reproduce."""
    import hashlib

    m = media_table(spark, sf_dir).filter(F.col("meta.kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = 1 + len(payload) % 4
                chars = bytes(payload).decode("utf-8")
                for i in range(n_frames):
                    # STUB: frame = utf-8 bytes of a 16-char slice
                    frame = chars[i * 16 : i * 16 + 16].encode("utf-8")
                    rows.append(
                        (doc_id, i, hashlib.md5(frame).hexdigest(), len(frame))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_fp", "frame_len"]
            )

    return m.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, frame_idx int, frame_fp string, frame_len int"
    )


@register(
    "mm_binary_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 4 = 0
    )
    SELECT sha256(text) AS payload_fp,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies,
           CAST(min(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes
    FROM corpus
    GROUP BY payload_fp
    HAVING count(*) > 1
    """,
)
def mm_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over BINARY payloads: sha-256 of the raw bytes, the
    multimodal twin of text `dedup_exact_hash` — how re-uploaded
    images/audio collapse in a media corpus. The hash computes
    map-side next to the scan so only 32-byte digests shuffle, never
    payloads (at 100 TB of media that is the entire game); min(doc_id)
    is the canonical survivor. Duplicate payloads are injected
    deterministically (doc_id%4 re-encoded under a new id). DuckDB's
    sha256(VARCHAR) hashes the same UTF-8 bytes Spark's
    sha2(encode(text), 256) does, so the fingerprints match
    byte-for-byte."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = d.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dupes)
    payload = F.encode("text", "utf-8")
    return (
        corpus.groupBy(F.sha2(payload, 256).alias("payload_fp"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
            F.min(F.length(payload)).cast("long").alias("n_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )
