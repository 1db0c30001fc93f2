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
