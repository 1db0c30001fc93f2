"""Edge-case BINARY-PAYLOAD differential (r9, sixth axis of the
edge-fixture program — VERDICT r8 task 6): degenerate payloads the
generated fixtures never contain, swept over every oracled consumer
that does BYTE-LEVEL work on a payload (discovered dynamically as the
queries whose oracle SQL calls ``encode(`` — the mm_* family plus the
byte-fold text fingerprints and the encode/decode scalar).

The multimodal table synthesizes payload = utf-8 bytes of document
text (operators/multimodal.py `media_table`), so payload degeneracy is
expressible as a documents mutation:

- ZERO-LENGTH payloads ('' text), one per media kind (kind = doc_id %
  3), hitting the magic sniffer (reads bytes 1-4 of nothing), the
  64-byte decode fold, the frame sampler (0 frames of a 0-char doc? —
  no: 1 + 0 % 4 = 1 frame of 0 bytes), and the windowed energy kernel;
- 1-3 BYTE payloads ('a', 'ab', 'abc') — shorter than the 4-byte magic
  window, the 16-char frame, and the 64-byte fold;
- MULTIBYTE-ONLY shorties ('中' = 1 char / 3 bytes, '中文' = 2 chars /
  6 bytes) — the char-vs-byte seam at payload sizes below every gate;
- ALL-IDENTICAL BYTES ('a' * 100, twice under different doc_ids) —
  constant-input degeneracy for hashes/energy/scene deltas, plus a
  byte-identical cross-id pair for the digest-dedup class;
- frame/fold BOUNDARY lengths: 15/16/17 chars (the 16-char frame
  stub) and 63/64/65 chars (the 64-byte decode fold and phash
  prefix);
- whitespace-only (' ') — 1 byte that tokenizes to empty tokens.

Special doc_ids are multiples of 35 (both %5 and %7 injected
truncation generations hit them — the standing convention) and chosen
to spread across all three doc_id % 3 media kinds.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import TABLES
from tests.conftest import SMOKE_SF_DIR, assert_matches_oracle

# Every oracled query whose SQL twin does byte-level payload work.
EDGE_QUERIES = sorted(
    name
    for name, sql in registry.oracle_sql().items()
    if "encode(" in sql
)

EDGE_DOCS = [
    # (doc_id, text) — id % 3 picks the media kind (0 image, 1 audio,
    # 2 video); ids are multiples of 35.
    # zero-byte payload, one per kind
    (910035, ""),     # % 3 == 0 image
    (910105, ""),     # % 3 == 1 audio
    (910070, ""),     # % 3 == 2 video
    # 1-3 byte payloads (below the 4-byte magic window)
    (910140, "a"),    # image
    (910210, "ab"),   # audio
    (910175, "abc"),  # video
    # multibyte-only shorties: 1 char / 3 bytes, 2 chars / 6 bytes
    (910245, "中"),    # image
    (910315, "中文"),  # audio
    # all-identical bytes, and a byte-identical cross-id pair
    (910280, "a" * 100),  # video
    (910350, "a" * 100),  # image — same bytes, different doc_id
    # frame-stub boundaries (16-char frames)
    (910420, "x" * 15),   # audio
    (910385, "x" * 16),   # video
    (910455, "x" * 17),   # image
    # decode-fold / phash-prefix boundaries (64 bytes)
    (910525, "y" * 63),   # audio
    (910490, "y" * 64),   # video
    (910560, "y" * 65),   # image
    # whitespace-only: 1 byte, zero real tokens
    (910630, " "),        # audio
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_payload_sf")
    for t in TABLES:
        src = os.path.join(SMOKE_SF_DIR, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            shutil.copy(src, d / f"{t}.parquet")
    con = duckdb.connect()
    rows = ", ".join(
        "(%d, '%s')" % (i, s.replace("'", "''")) for i, s in EDGE_DOCS
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/documents.parquet')
          UNION ALL
          SELECT doc_id, text, 'en' AS lang, 'edge' AS source,
                 length(text) AS n_chars
          FROM (VALUES {rows}) v(doc_id, text)
        ) TO '{d / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(edge_sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_slice_is_nonempty_and_covers_mm():
    """The discovery rule must keep catching the mm family — if the
    oracles stop using encode() the suite would silently go empty."""
    assert len(EDGE_QUERIES) >= 10
    assert sum(n.startswith("mm_") for n in EDGE_QUERIES) >= 9


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_payload_oracle_match(spark, edge_duck, edge_sf_dir, name):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    assert name in queries, f"{name} not registered"
    assert name in oracles, f"{name} has no oracle"
    assert_matches_oracle(
        queries[name](spark, edge_sf_dir), edge_duck, oracles[name]
    )
