"""Edge-case corpus differential (VERDICT r6 tasks 2+6): the latent
Spark<->DuckDB `list_slice` divergence class is only reachable with
degenerate documents, which the generated testdata never contains. This
suite rebuilds an sf0.001-sized fixture dir with an edge-hardened
`documents` table — empty text, 1-token, 2-token, multibyte/unicode
text, a duplicated doc_id row, and a 12-doc identical-text megacluster
— and re-runs the text-dedup registry slice against its DuckDB oracles
on that data.

Engine-semantics notes encoded in the fixture design:

- Spark ``concat_ws`` returns '' on an empty array; DuckDB
  ``array_to_string`` returns NULL — oracles wrap with
  ``coalesce(..., '')`` (swept r7).
- Spark ``slice(t, 1, n)`` needs ``greatest(n, 0)``; DuckDB
  ``list_slice(t, 1, -1)`` silently switches to from-the-end indexing —
  oracles clamp with ``greatest(len(t)-k, 0)`` (swept r7).
- DuckDB ``levenshtein`` is BYTE-based, Spark's is CHAR-based. They
  agree whenever the strings differ only by an ASCII region, so the
  unicode fixture doc keeps its trailing (truncation-dropped) words
  ASCII. A dedicated probe test pins this inequality so the constraint
  is visible, not folklore.

Special doc_ids are multiples of 35 so both the %5 and %7 injected
truncation generations hit the edge docs.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import TABLES
from tests.conftest import SMOKE_SF_DIR, assert_matches_oracle

# EVERY oracled query whose SQL twin reads `documents` (discovered
# dynamically so new registrations are edge-covered automatically —
# r7 widened this from a curated 18 to the full consumer slice after
# the full-slice sweep surfaced byte/char and dup-join bugs the
# curated list missed).
EDGE_QUERIES = sorted(
    name
    for name, sql in registry.oracle_sql().items()
    if "documents" in sql
)

MEGA_TEXT = (
    "identical mega cluster text repeated verbatim for the degenerate "
    "star versus pairwise audit path"
)

EDGE_DOCS = [
    # (doc_id, text) — ids are multiples of 35 (hit %5 and %7 injectors)
    (900060, ""),                      # empty text -> 1 empty token
    (900095, "solo"),                  # 1 token: len-2 clamp fires
    (900130, "two tokens"),            # 2 tokens: len-2 == 0 boundary
    # unicode body, ASCII tail (tail is what truncation drops, keeping
    # byte-based DuckDB levenshtein == char-based Spark levenshtein)
    (900165, "héllo wörld dédup ünïcode tëst ça 中文 分词 zz yy xx"),
    # multibyte docs in the AUDIO (%3==1) and VIDEO (%3==2) media
    # classes, >= 64 chars so the phash/scene length gates admit them
    # (ADVICE r7: the only unicode doc was %3==0 and < 64 chars, so the
    # byte-folding audio/scene/phash/winnow oracles were never
    # exercised on multibyte text). Ids stay multiples of 35; unicode
    # up front, ASCII truncation tail.
    (
        900445,  # % 3 == 1 -> audio
        "äudio wäveförm énergie 中文音频 sïgnal pülse tönspur çanal "
        "mixdown sample frame window block tail end pad zz yy xx ww",
    ),
    (
        900410,  # % 3 == 2 -> video
        "vïdeö szène çadre 中文视频 këyframe émis lümine bildfolge "
        "cutpoint delta frame scene block tail end pad zz yy xx ww",
    ),
    # duplicate doc_id, identical text (survivorship tie path)
    (900200, "dup row dup row dup row tie path"),
    (900200, "dup row dup row dup row tie path"),
] + [
    # 12-doc identical-text megacluster (ids span %5/%7 residues)
    (900300 + i, MEGA_TEXT)
    for i in range(12)
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    """sf0.001 clone with documents.parquet replaced by the hardened
    corpus (original docs + EDGE_DOCS)."""
    d = tmp_path_factory.mktemp("edge_sf")
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


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_oracle_match(spark, edge_duck, edge_sf_dir, name):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    assert name in queries, f"{name} not registered"
    assert name in oracles, f"{name} has no oracle"
    assert_matches_oracle(
        queries[name](spark, edge_sf_dir), edge_duck, oracles[name]
    )


def test_levenshtein_byte_vs_char_probe():
    """Pins the engine asymmetry the fixture is designed around: DuckDB
    levenshtein counts BYTES on multibyte text, Spark counts CHARS. If
    DuckDB ever switches to char semantics this starts failing and the
    ASCII-tail constraint in EDGE_DOCS can be dropped."""
    con = duckdb.connect()
    byte_dist = con.execute(
        "SELECT levenshtein('héllo wörld', 'héllo')"
    ).fetchone()[0]
    con.close()
    assert byte_dist == 7  # ' wörld' = 6 chars but 7 UTF-8 bytes
