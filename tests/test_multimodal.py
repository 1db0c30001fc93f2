"""Multimodal decode-kernel selection (SURVEY.md §2 B10).

The registered `mm_decode_features` query always uses the
deterministic stub (the oracle path); the PIL-backed kernel is a
feature flag that activates only when Pillow is importable, and
degrades back to the stub when it is not — a job must never fail
because a worker lacks an imaging library.
"""

from __future__ import annotations

import pytest

from apache_spark_irs_form_990_spark.operators.multimodal import (
    _decode_pil,
    _decode_stub,
    _pick_decoder,
)

# Smallest valid PNG: 1x1 RGB pixel (deterministic byte literal).
_PNG_1x1 = bytes.fromhex(
    "89504e470d0a1a0a"  # signature
    "0000000d49484452000000010000000108020000009077"
    "3de5"  # IHDR (1x1, 8-bit RGB)
    "0000000c4944415408d763f8cfc000000301010018dd8d"
    "b0"  # IDAT
    "0000000049454e44ae426082"  # IEND
)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_stub_is_default_and_deterministic():
    decode = _pick_decoder()
    assert decode is _decode_stub
    assert _decode_stub(b"hello world") == _decode_stub(b"hello world")
    w, h, c = _decode_stub(b"hello world")
    assert c == 3 and 64 <= w < 1088 and 64 <= h < 1088


def test_pil_kernel_falls_back_when_library_absent():
    decode = _pick_decoder("pil")
    if _pil_available():
        assert decode is _decode_pil
    else:
        assert decode is _decode_stub  # graceful degradation, no raise


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_pil_kernel_decodes_synthetic_png():
    assert _decode_pil(_PNG_1x1) == (1, 1, 3)


class TestRound3Kernels:
    """Behavioral properties of the round-3 media kernels that the
    oracle differential can't express: injection recall for the
    perceptual hash, batch-shape independence for the block pooler."""

    def test_phash_finds_injected_near_dups(self, spark):
        from apache_spark_irs_form_990_spark.operators.multimodal import (
            mm_phash_hamming_dedup,
        )
        from tests.conftest import SF_DIR

        pairs = mm_phash_hamming_dedup(spark, SF_DIR)
        injected = pairs.filter(
            (pairs.id_b == pairs.id_a + 4000000)
        )
        rows = injected.collect()
        # 1-byte corruption → tiny hamming; banding must recover most
        # injected originals (LSH recall < 1 is honest, 0 is a bug).
        assert len(rows) >= 50
        assert all(r.hamming <= 6 for r in rows)

    def test_phash_pairs_are_ordered_and_deduped(self, spark):
        from apache_spark_irs_form_990_spark.operators.multimodal import (
            mm_phash_hamming_dedup,
        )
        from tests.conftest import SF_DIR

        pdf = mm_phash_hamming_dedup(spark, SF_DIR).toPandas()
        assert (pdf.id_a < pdf.id_b).all()
        assert not pdf.duplicated(["id_a", "id_b"]).any()

    def test_resize_blocks_partition_invariant(self, spark):
        """The Arrow kernel is per-row: repartitioning (different batch
        boundaries) must not change a single output value."""
        from apache_spark_irs_form_990_spark.operators.multimodal import (
            media_table, _RESIZE_BLOCKS,
        )
        import apache_spark_irs_form_990_spark.operators.multimodal as mm
        from tests.conftest import SF_DIR

        base = mm.mm_resize_block_stats(spark, SF_DIR).toPandas()
        m = media_table(spark, SF_DIR).filter("meta.kind = 'image'")
        # same kernel over a 1-partition copy (different Arrow batches)
        import pandas as pd

        alt = (
            m.repartition(1)
            .select("doc_id", "payload")
            .mapInPandas(
                mm.resize_kernel(),
                schema="doc_id long, block_idx int, block_len int, mean_milli long",
            )
            .toPandas()
        )
        key = ["doc_id", "block_idx"]
        b = base.sort_values(key, ignore_index=True)
        a = alt.sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        assert (b.groupby("doc_id").size() == _RESIZE_BLOCKS).all()

    def test_audio_windows_cover_payload(self, spark, duck):
        """Top window length never exceeds the window size and the
        winning index is within the payload's window range."""
        from apache_spark_irs_form_990_spark.operators.multimodal import (
            mm_audio_energy_windows, _AUDIO_WIN,
        )
        from tests.conftest import SF_DIR

        pdf = mm_audio_energy_windows(spark, SF_DIR).toPandas()
        assert (pdf.win_len > 0).all() and (pdf.win_len <= _AUDIO_WIN).all()
        assert (pdf.energy >= 0).all()
        n_audio = duck.execute(
            "SELECT count(*) FROM documents WHERE CAST(doc_id % 3 AS INT) = 1"
        ).fetchone()[0]
        assert len(pdf) == n_audio  # exactly one winner per audio item
