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

from apache_spark_irs_form_990_spark.functions.text import sql_utf8_codes
from apache_spark_irs_form_990_spark.functions.vectors import nonzero_milli
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
           octet_length(encode(text)) AS n_bytes
    FROM documents
    WHERE CAST(doc_id % 3 AS INT) = 0 AND octet_length(encode(text)) > 200
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
    # oracle re-derives it in SQL and the whole mapInPandas plumbing is
    # hash-checked, not just row-counted. Byte-exact (r7): bytes come
    # from hex(encode(text)) pair-parsing, so multibyte text folds the
    # same UTF-8 bytes the Spark kernel reads (the old ord(char) form
    # assumed ASCII and diverged on unicode documents).
    oracle="""
    WITH hx AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             hex(encode(text)) AS hh
      FROM documents
    ),
    codes AS (
      SELECT doc_id, n_bytes,
             list_reduce(
               [CAST(0 AS BIGINT)] ||
                 [CAST(16 * (strpos('0123456789ABCDEF',
                                    substr(hh, 2 * i - 1, 1)) - 1)
                       + (strpos('0123456789ABCDEF',
                                 substr(hh, 2 * i, 1)) - 1) AS BIGINT)
                  FOR i IN generate_series(1, least(64, n_bytes))],
               (acc, b) -> (acc * 131 + b) % 1000003) AS h
      FROM hx
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
           CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
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


_RESIZE_BLOCKS = 8


def _resize_oracle() -> str:
    """DuckDB twin of the block-pool kernel: byte values re-derived as
    ord() over the ASCII payload chars (the same byte==char contract
    `mm_decode_features` documents), block boundaries by the identical
    integer division."""
    return f"""
    WITH imgs AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
        AND octet_length(encode(text)) >= {_RESIZE_BLOCKS}
    ),
    codes AS (
      -- byte-exact (r7): hex-pair parsing of the UTF-8 payload, not
      -- ord(char) — identical to the kernel's bytes on multibyte text
      SELECT doc_id, n,
             [CAST(16 * (strpos('0123456789ABCDEF',
                                substr(hh, 2 * i - 1, 1)) - 1)
                   + (strpos('0123456789ABCDEF',
                             substr(hh, 2 * i, 1)) - 1) AS BIGINT)
              FOR i IN generate_series(1, n)] AS c
      FROM (SELECT doc_id, n, hex(encode(text)) AS hh FROM imgs)
    )
    SELECT doc_id, CAST(b AS INT) AS block_idx,
           CAST(((b + 1) * n) // {_RESIZE_BLOCKS}
                - (b * n) // {_RESIZE_BLOCKS} AS INT) AS block_len,
           CAST((list_sum(list_slice(c, (b * n) // {_RESIZE_BLOCKS} + 1,
                                     ((b + 1) * n) // {_RESIZE_BLOCKS})) * 1000)
                // (((b + 1) * n) // {_RESIZE_BLOCKS}
                    - (b * n) // {_RESIZE_BLOCKS}) AS BIGINT) AS mean_milli
    FROM codes, LATERAL (SELECT unnest(generate_series(0, {_RESIZE_BLOCKS - 1})) AS b)
    """


@register("mm_resize_block_stats", oracle=_resize_oracle())
def mm_resize_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail analogue for image payloads: pool the payload
    bytes into a fixed grid of {B} blocks and emit each block's exact
    integer mean intensity (milli-units, floor division — no floats).
    A real image resize is exactly this shape — decode, block-average,
    emit a small fixed-size representation — with a 2-D kernel instead
    of this 1-D STUB over raw bytes.

    Plan shape: the kernel runs inside the scan task via Arrow-batched
    mapInPandas (one numpy reduceat per batch — no per-byte Python);
    only {B} small ints per item ever leave the scan, the payload
    never shuffles. The fixed output size is the point at 100 TB:
    downstream stages cost O(items), not O(bytes).

    Payloads shorter than {B} bytes are filtered out (mirrored in the
    oracle): they would yield zero-length blocks, where the kernel's
    floor division raises and `reduceat` mis-sums repeated indices —
    the same guard [[mm_phash_hamming_dedup]] applies."""
    m = media_table(spark, sf_dir).filter(
        (F.col("meta.kind") == "image")
        & (F.col("meta.n_bytes") >= _RESIZE_BLOCKS)
    )
    return m.select("doc_id", "payload").mapInPandas(
        resize_kernel(),
        schema="doc_id long, block_idx int, block_len int, mean_milli long",
    )


def resize_kernel():
    """The block-pool kernel as a standalone factory — shared by the
    registered operator and the partition-invariance test (one copy to
    keep in sync with the SQL twin)."""
    import numpy as np

    B = _RESIZE_BLOCKS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(arr)
                idx = (np.arange(B, dtype=np.int64) * n) // B
                sums = np.add.reduceat(arr, idx)
                lens = np.diff(np.append(idx, n))
                for b in range(B):
                    rows.append(
                        (doc_id, b, int(lens[b]), int(sums[b] * 1000 // lens[b]))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "block_idx", "block_len", "mean_milli"]
            )

    return run


mm_resize_block_stats.__doc__ = mm_resize_block_stats.__doc__.format(B=_RESIZE_BLOCKS)

_PHASH_BITS = 64
_PHASH_QUARTERS = 4
_PHASH_MAX_HAMMING = 6


def _phash_oracle() -> str:
    """DuckDB twin of the perceptual-hash kernel: per-block bits from
    the same integer cross-multiplication (block_sum * n > total *
    block_len — no division, exact in both engines), quarters packed
    with the same shifts, candidates from the same quarter-banding."""
    K, Q = _PHASH_BITS, _PHASH_QUARTERS
    per = K // Q
    quarter_exprs = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN bs[{q * per + j + 1}] * n > total * bl[{q * per + j + 1}]"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(per)
        )
        + f" AS BIGINT) AS q{q}"
        for q in range(Q)
    )
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, q0, q1, q2, q3, {q} AS band, q{q} AS key FROM fp"
        for q in range(Q)
    )
    ham = " + ".join(f"bit_count(xor(a.q{q}, b.q{q}))" for q in range(Q))
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE len(text) >= {K}
      UNION ALL
      SELECT doc_id + 4000000,
             substr(text, 1, 10) || 'X' || substr(text, 12)
      FROM documents WHERE doc_id % 6 = 0 AND len(text) >= {K}
    ),
    codes AS (
      -- byte-exact (r8): hex-pair parsing of the UTF-8 payload, not
      -- ord(char) — the old form indexed CODE POINTS over 1..n where n
      -- is the BYTE length, diverging from the kernel's raw bytes on
      -- any multibyte document (found by ADVICE r7; same fix as
      -- mm_decode_features / mm_resize_block_stats)
      SELECT doc_id, n, {sql_utf8_codes()} AS c
      FROM (SELECT doc_id, octet_length(encode(text)) AS n,
                   hex(encode(text)) AS hh
            FROM corpus)
    ),
    blocks AS (
      SELECT doc_id, n, list_sum(c) AS total,
             [list_sum(list_slice(c, (b * n) // {K} + 1, ((b + 1) * n) // {K}))
              FOR b IN generate_series(0, {K - 1})] AS bs,
             [((b + 1) * n) // {K} - (b * n) // {K}
              FOR b IN generate_series(0, {K - 1})] AS bl
      FROM codes
    ),
    fp AS (SELECT doc_id, {quarter_exprs} FROM blocks),
    banded AS (
      {bands}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST({ham} AS INT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE {ham} <= {_PHASH_MAX_HAMMING}
    """


@register("mm_phash_hamming_dedup", oracle=_phash_oracle())
def mm_phash_hamming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup over BINARY payloads — the multimodal
    analogue of `dedup_simhash`: a {K}-bit fingerprint per payload
    (bit b = does block b's mean intensity exceed the payload mean,
    computed as an exact integer cross-multiplication), packed into
    {Q} 16-bit quarters; candidate pairs share at least one exact
    quarter (pigeonhole banding — hamming <= {Q_minus_1} is caught
    with certainty, the configured gate is <= {H}); exact popcount of
    the quarter XORs confirms. A real pHash swaps the 1-D block-mean
    STUB for a DCT over decoded pixels; the fingerprint width, the
    banding, and every plan shape downstream are unchanged.

    Near-dups are injected deterministically (every 6th payload
    re-appears under doc_id+4e6 with byte 11 overwritten) — a 1-byte
    corruption, the re-encoded-thumbnail case exact `mm_binary_dedup`
    can never catch.

    Scale shape: the kernel is one numpy reduceat + matmul-free pack
    per Arrow batch inside the scan task; only {Q} small ints per item
    shuffle (keyed on (band, quarter) — Σ bucket² pair work, no
    unbucketed self-join); payload bytes never leave the scan."""
    import numpy as np

    K, Q = _PHASH_BITS, _PHASH_QUARTERS
    per = K // Q
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.length("text") >= K
    )
    near = docs.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 10), F.lit("X"), F.expr("substring(text, 12)")
        ).alias("text"),
    )
    corpus = docs.unionByName(near).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(arr)
                idx = (np.arange(K, dtype=np.int64) * n) // K
                sums = np.add.reduceat(arr, idx)
                lens = np.diff(np.append(idx, n))
                bits = sums * n > arr.sum() * lens
                qs = [
                    int((bits[q * per : (q + 1) * per] << np.arange(per)).sum())
                    for q in range(Q)
                ]
                rows.append((doc_id, *qs))
            yield pd.DataFrame(rows, columns=["doc_id", "q0", "q1", "q2", "q3"])

    fp = corpus.mapInPandas(
        run, schema="doc_id long, q0 long, q1 long, q2 long, q3 long"
    ).localCheckpoint()
    banded = fp.select(
        "doc_id", "q0", "q1", "q2", "q3",
        F.posexplode(F.array("q0", "q1", "q2", "q3")).alias("band", "key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.q{q}").bitwiseXOR(F.col(f"b.q{q}"))) for q in range(Q)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
    )


mm_phash_hamming_dedup.__doc__ = mm_phash_hamming_dedup.__doc__.format(
    K=_PHASH_BITS, Q=_PHASH_QUARTERS, Q_minus_1=_PHASH_QUARTERS - 1,
    H=_PHASH_MAX_HAMMING,
)

_AUDIO_WIN = 64


def _audio_oracle() -> str:
    W = _AUDIO_WIN
    return f"""
    WITH auds AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 1
    ),
    codes AS (
      -- byte-exact (r8): hex-pair parsing, not ord(char) — see
      -- sql_utf8_codes; the old form diverged on multibyte payloads
      SELECT doc_id, n, {sql_utf8_codes()} AS c
      FROM (SELECT doc_id, n, hex(encode(text)) AS hh FROM auds)
    ),
    wins AS (
      -- n > 0 guard (r9, found by tests/test_edge_payloads.py): a
      -- zero-byte payload has ZERO windows. Python floors
      -- (0-1)//{W} to -1 (empty range); DuckDB's // TRUNCATES
      -- toward zero, so (n-1)//{W} at n=0 is 0 and generate_series
      -- would mint a phantom 0-length NULL-energy window
      SELECT doc_id, CAST(w AS INT) AS win_idx,
             CAST(least((w + 1) * {W}, n) - w * {W} AS INT) AS win_len,
             CAST(list_sum(list_transform(
               list_slice(c, w * {W} + 1, least((w + 1) * {W}, n)),
               x -> (x - 128) * (x - 128))) AS BIGINT) AS energy
      FROM codes, LATERAL (SELECT unnest(generate_series(0, (n - 1) // {W})) AS w)
      WHERE n > 0
    )
    SELECT doc_id, win_idx, win_len, energy FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY energy DESC, win_idx) AS rn
      FROM wins
    ) WHERE rn = 1
    """


@register("mm_audio_energy_windows", oracle=_audio_oracle())
def mm_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudest-frame selection for audio payloads: the payload is cut
    into fixed {W}-byte windows (last one partial), each window scored
    by exact integer energy (sum of squared 128-centered byte values —
    the RMS numerator, no floats), and the top-energy window per item
    is emitted. This is the audio twin of video keyframe extraction:
    a real kernel swaps the byte STUB for PCM samples and the energy
    for a spectral score; the frame/score/top-1 plumbing is identical.

    Plan shape: the kernel emits one small row per window from inside
    the scan task (Arrow-batched, one numpy pass per batch); the top-1
    is a WindowGroupLimit over (doc_id) — rank filter pushed map-side
    before the exchange — so what shuffles is O(windows) tiny rows,
    and the payload never does."""
    import numpy as np

    m = media_table(spark, sf_dir).filter(F.col("meta.kind") == "audio")
    W = _AUDIO_WIN

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                sq = (arr - 128) ** 2
                for w in range(0, (len(arr) - 1) // W + 1):
                    seg = sq[w * W : (w + 1) * W]
                    rows.append((doc_id, w, len(seg), int(seg.sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "win_idx", "win_len", "energy"]
            )

    wins = m.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, win_idx int, win_len int, energy long"
    )
    from pyspark.sql import Window

    top = Window.partitionBy("doc_id").orderBy(F.col("energy").desc(), "win_idx")
    return (
        wins.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


mm_audio_energy_windows.__doc__ = mm_audio_energy_windows.__doc__.format(W=_AUDIO_WIN)


@register(
    "mm_modality_storage_report",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS fp
      FROM documents
    )
    SELECT kind,
           count(*) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           max(n_bytes) AS max_bytes,
           CAST((sum(n_bytes) * 1000) // count(*) AS BIGINT) AS avg_bytes_milli,
           count(DISTINCT fp) AS n_distinct_payloads
    FROM m
    GROUP BY kind
    """,
)
def mm_modality_storage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality storage rollup — the capacity-planning query every
    media corpus runs nightly: item counts, byte totals/max, exact
    integer mean (milli-bytes, floor division), and distinct-payload
    count via map-side sha-256 (32-byte digests shuffle, payloads
    don't). One partial+final hash aggregate on the 3-value kind key;
    the distinct rides the same exchange as an Expand, which is
    acceptable because the group count is constant — at larger
    cardinality the HLL sketch (`agg_approx_count_distinct_raw`
    pattern) replaces it."""
    m = media_table(spark, sf_dir)
    return (
        m.select(
            F.col("meta.kind").alias("kind"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("fp"),
        )
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.expr("sum(n_bytes) * 1000 div count(*)").alias("avg_bytes_milli"),
            F.countDistinct("fp").alias("n_distinct_payloads"),
        )
    )


_SCENE_FRAME = 32
_SCENE_THRESHOLD = 900


def _scene_oracle() -> str:
    W, T = _SCENE_FRAME, _SCENE_THRESHOLD
    return f"""
    WITH vids AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
      WHERE CAST(doc_id % 3 AS INT) = 2 AND octet_length(encode(text)) >= {2 * W}
    ),
    codes AS (
      -- byte-exact (r8): hex-pair parsing, not ord(char) — see
      -- sql_utf8_codes; the old form diverged on multibyte payloads
      SELECT doc_id, n // {W} AS nf, {sql_utf8_codes()} AS c
      FROM (SELECT doc_id, n, hex(encode(text)) AS hh FROM vids)
    ),
    deltas AS (
      SELECT doc_id, nf,
             [list_sum([abs(c[j * {W} + i] - c[(j + 1) * {W} + i])
                        FOR i IN generate_series(1, {W})])
              FOR j IN generate_series(0, nf - 2)] AS d
      FROM codes
    )
    SELECT doc_id,
           CAST(nf AS INT) AS n_frames,
           CAST(1 + len(list_filter(d, x -> x > {T})) AS INT) AS n_scenes,
           CAST(list_max(d) AS BIGINT) AS max_delta
    FROM deltas
    """


@register("mm_video_scene_change", oracle=_scene_oracle())
def mm_video_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCENE-CHANGE detection for video payloads — the third leg of the
    video pipeline after frame sampling ([[mm_frame_sample]]) and
    binary dedup: consecutive fixed-size frames ({W} bytes) are
    compared by exact integer L1 distance, and a cut is declared where
    the inter-frame delta exceeds the threshold ({T}); each item
    reports its frame count, scene count (1 + cuts) and maximum
    delta. A real implementation swaps the byte-frame STUB for decoded
    luma planes and the L1 for a histogram distance — the
    consecutive-pair comparison, thresholding, and per-item rollup
    shapes are exactly these.

    Plan shape: one numpy pass per Arrow batch inside the scan task
    (vectorized abs-diff over a strided view — consecutive-frame
    comparison never crosses rows, so there is NO self-join and no
    shuffle of anything but the 4-int result per item)."""
    import numpy as np

    W, T = _SCENE_FRAME, _SCENE_THRESHOLD
    m = media_table(spark, sf_dir).filter(
        (F.col("meta.kind") == "video") & (F.col("meta.n_bytes") >= 2 * W)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                nf = len(arr) // W
                frames = arr[: nf * W].reshape(nf, W)
                d = np.abs(frames[1:] - frames[:-1]).sum(axis=1)
                rows.append(
                    (doc_id, nf, 1 + int((d > T).sum()), int(d.max()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_scenes", "max_delta"]
            )

    return m.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, n_frames int, n_scenes int, max_delta long"
    )


mm_video_scene_change.__doc__ = mm_video_scene_change.__doc__.format(
    W=_SCENE_FRAME, T=_SCENE_THRESHOLD
)


@register(
    "mm_token_budget_report",
    # token-cost model (deterministic, integer): text items cost their
    # whitespace word count; image items a fixed 576 patch tokens
    # (ViT-L/14 at 336px); audio/video items one token per 64-byte
    # frame — the STUB analogue of a real multimodal tokenizer's
    # per-modality cost function.
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             octet_length(encode(text)) AS n_bytes,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words
      FROM documents
    ),
    costed AS (
      SELECT kind,
             CASE kind WHEN 'image' THEN 576
                  ELSE (n_bytes + 63) // 64 END
               + CASE kind WHEN 'image' THEN n_words ELSE 0 END AS tokens
      FROM m
    )
    SELECT kind,
           count(*) AS n_items,
           CAST(sum(tokens) AS BIGINT) AS total_tokens,
           CAST((sum(tokens) * 1000) // count(*) AS BIGINT) AS avg_tokens_milli
    FROM costed
    GROUP BY kind
    """,
)
def mm_token_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal TRAINING-TOKEN budget accounting — the question every
    VLM data mix starts with ("how many tokens does this corpus cost,
    per modality?"): each item is costed by a per-modality function
    (images: 576 fixed patch tokens + caption words; audio/video: one
    token per 64-byte frame, ceiling division) and rolled up per kind
    with exact integer totals and milli-means. Downstream this feeds
    [[pipeline_pretrain_mix]] (mix weights need per-source token
    counts, not item counts — a modality with few huge items dominates
    a naive item-weighted mix). One hash aggregate over scan-side
    arithmetic; the caption is decoded from the payload in the same
    scan task (no join back to documents — a re-join on doc_id would
    double-count duplicated rows and add a shuffle)."""
    m = media_table(spark, sf_dir)
    words = F.size(
        F.filter(F.split(F.col("caption"), " "), lambda x: x != F.lit(""))
    )
    # caption decoded from the payload itself (it IS the utf-8 text):
    # re-joining documents on doc_id would double-count a duplicated
    # doc_id row (2x2 join multiplicity) and costs a shuffle besides
    joined = m.select(
        "doc_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.decode("payload", "utf-8").alias("caption"),
    )
    tokens = (
        F.when(F.col("kind") == "image", F.lit(576) + words)
        .otherwise(F.floor((F.col("n_bytes") + 63) / 64))
        .cast("long")
    )
    return (
        joined.select("kind", tokens.alias("tokens"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("tokens").alias("total_tokens"),
            F.expr("sum(tokens) * 1000 div count(*)").alias("avg_tokens_milli"),
        )
    )


_CLIP_DIMS = 64  # hashed bag-of-words projection width (= embedding dims)
_CLIP_TAU = 0.15  # keep threshold (p90 of the fixture's alignment dist)


def _clip_score_oracle() -> str:
    D, TAU = _CLIP_DIMS, _CLIP_TAU
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tvec AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(token), 1, 2)) AS BIGINT) % {D}
               AS d,
             CAST(sum(CASE WHEN substr(md5(token), 3, 1) < '8'
                      THEN 1 ELSE -1 END) AS BIGINT) AS td
      FROM toks GROUP BY doc_id, lang, d
    ),
    mv AS MATERIALIZED (
      SELECT vec_id, v FROM (
        SELECT vec_id,
                    list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings
      ) WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    dots AS (
      SELECT t.doc_id, t.lang,
             CAST(sum(t.td * m.v[t.d + 1]) AS BIGINT) AS dotp,
             CAST(sum(t.td * t.td) AS BIGINT) AS tn2
      FROM tvec t JOIN mv m ON t.doc_id = m.vec_id
      GROUP BY t.doc_id, t.lang
    ),
    scored AS (
      SELECT d.doc_id, d.lang,
             CAST(round(CAST(d.dotp AS DOUBLE)
                  / (sqrt(CAST(d.tn2 AS DOUBLE))
                     * sqrt(CAST(n.vn2 AS DOUBLE))) * 1000000) AS BIGINT)
               AS align_micro
      FROM dots d
      JOIN (SELECT vec_id,
                   CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
                     AS vn2
            FROM mv) n ON d.doc_id = n.vec_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE align_micro >= {int(TAU * 1e6)})
                AS BIGINT) AS n_keep,
           CAST(sum(align_micro) AS DOUBLE) / (1000000.0 * count(*))
             AS mean_align
    FROM scored GROUP BY lang ORDER BY lang
    """


@register("mm_clip_score_filter", oracle=_clip_score_oracle())
def mm_clip_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score alignment filtering — the DataComp / LAION gate
    (Schuhmann et al. 2021; Gadre et al. 2023): a caption-like text is
    kept only if it AGREES with its paired modality embedding, scored
    as the cosine between a text-derived vector and the stored
    embedding, thresholded, and accounted per language. Documents pair
    with embeddings on doc_id = vec_id (the captioned subset); the
    text side is a deterministic 64-dim hashed bag-of-words projection
    (token -> md5 -> dimension + sign, the hashing-trick twin of
    `ml_feature_hash_bucket`) standing in for the text tower, since no
    model weights exist in this sandbox — the SPARK-SIDE shape (explode
    -> hash -> sparse-by-dim sum -> dot against a dense stored vector)
    is exactly what a real CLIP text/image scorer feeds.

    All arithmetic before the final division is exact integers (sign
    sums, milli-embedding products); each pair's cosine is integerized
    to micro units before the per-lang mean, so the report is
    order-independent (the `sim_label_contrast` device). Scale shape:
    the sparse text vector never materializes as an array — it stays
    (doc, dim, weight) rows, so the dot is one hash-agg over
    |tokens| rows joined against the embedding scan; no crossjoin, no
    window, and the only shuffles are keyed on doc_id. The keep
    threshold 0.15 is the fixture distribution's p90 — the report
    shows both sides of the gate rather than silently dropping."""
    D = _CLIP_DIMS
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    )
    h = F.md5(F.col("token"))
    tvec = (
        toks.select(
            "doc_id",
            "lang",
            (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % D).alias("d"),
            F.when(F.substring(h, 3, 1) < "8", 1).otherwise(-1).alias("s"),
        )
        .groupBy("doc_id", "lang", "d")
        .agg(F.sum("s").cast("long").alias("td"))
    )
    mv = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
        ).alias("v"),
    ).transform(nonzero_milli)
    dots = (
        tvec.join(mv, tvec.doc_id == mv.vec_id)
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("td") * F.element_at("v", F.col("d").cast("int") + 1))
            .cast("long")
            .alias("dotp"),
            F.sum(F.col("td") * F.col("td")).cast("long").alias("tn2"),
        )
    )
    norms = mv.select(
        "vec_id",
        F.aggregate(
            F.transform("v", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("vn2"),
    )
    align = F.col("dotp").cast("double") / (
        F.sqrt(F.col("tn2").cast("double")) * F.sqrt(F.col("vn2").cast("double"))
    )
    scored = dots.join(norms, dots.doc_id == norms.vec_id).select(
        "lang", F.round(align * 1000000).cast("long").alias("align_micro")
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count(
                F.when(F.col("align_micro") >= int(_CLIP_TAU * 1e6), 1)
            ).alias("n_keep"),
            (
                F.sum("align_micro").cast("double")
                / (F.lit(1000000.0) * F.count(F.lit(1)))
            ).alias("mean_align"),
        )
        .orderBy("lang")
    )
