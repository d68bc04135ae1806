"""Native (C++) decode tier: parity with PIL, fallbacks, batch semantics.

The native tier replaces the PIL hot path for the host loader the way the
reference leaned on tf.data's C++ decode ops (reference:
data/preprocess/preprocess.py:61-77); these tests pin its contract.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from sav_tpu import native
from sav_tpu.data.jpeg_source import decode_jpeg_fixed


def _jpeg_bytes(h=96, w=128, quality=92, mode='RGB'):
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([(xx * 255 // w), (yy * 255 // h), (xx + yy) % 256],
                   axis=-1).astype(np.uint8)
    img = Image.fromarray(arr)
    if mode != 'RGB':
        img = img.convert(mode)
    buf = io.BytesIO()
    img.save(buf, 'JPEG', quality=quality)
    return buf.getvalue()


needs_native = pytest.mark.skipif(not native.available(),
                                  reason='native decoder unavailable')


@needs_native
def test_native_matches_pil_geometry_and_values():
    data = _jpeg_bytes(300, 460)
    nat = native.decode_jpeg_fixed_native(data, 64)
    pil = decode_jpeg_fixed(io.BytesIO(data), 64, allow_native=False)
    assert nat.shape == pil.shape == (64, 64, 3)
    assert nat.dtype == np.uint8
    # different resampling filters (PIL triangle vs fused bilinear): close,
    # not bit-identical — downstream is training augmentation, not eval math
    diff = np.abs(nat.astype(np.int16) - pil.astype(np.int16))
    assert diff.mean() < 2.0
    assert np.percentile(diff, 95) <= 16


@needs_native
def test_decode_jpeg_fixed_routes_native_and_matches_path_and_file():
    data = _jpeg_bytes(200, 150)
    via_file = decode_jpeg_fixed(io.BytesIO(data), 48)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix='.jpg', delete=False) as f:
        f.write(data)
        path = f.name
    try:
        via_path = decode_jpeg_fixed(path, 48)
    finally:
        os.remove(path)
    np.testing.assert_array_equal(via_file, via_path)
    nat = native.decode_jpeg_fixed_native(data, 48)
    np.testing.assert_array_equal(via_file, nat)


@needs_native
def test_grayscale_jpeg_decodes_to_rgb():
    data = _jpeg_bytes(mode='L')
    nat = native.decode_jpeg_fixed_native(data, 32)
    assert nat is not None and nat.shape == (32, 32, 3)
    # grayscale -> identical channels
    assert int(np.abs(nat[..., 0].astype(np.int16)
                      - nat[..., 1].astype(np.int16)).max()) <= 1


@needs_native
def test_cmyk_declined_natively_but_fixed_path_still_decodes():
    data = _jpeg_bytes(mode='CMYK')
    assert native.decode_jpeg_fixed_native(data, 32) is None
    out = decode_jpeg_fixed(io.BytesIO(data), 32)  # PIL fallback
    assert out.shape == (32, 32, 3)


@needs_native
def test_corrupt_stream_declined_not_crashed():
    data = _jpeg_bytes()[:40]
    assert native.decode_jpeg_fixed_native(data, 32) is None
    truncated = _jpeg_bytes()
    truncated = truncated[:len(truncated) // 2]
    native.decode_jpeg_fixed_native(truncated, 32)  # may be None; must not crash


@needs_native
def test_batch_equals_singles_and_fills_failures_via_pil():
    goods = [_jpeg_bytes(120 + 8 * i, 160) for i in range(5)]
    bad = _jpeg_bytes(mode='CMYK')
    datas = goods + [bad]
    out = native.decode_jpeg_batch_native(datas, 40, nthreads=2)
    assert out.shape == (6, 40, 40, 3)
    for i, d in enumerate(goods):
        np.testing.assert_array_equal(out[i],
                                      native.decode_jpeg_fixed_native(d, 40))
    np.testing.assert_array_equal(
        out[5], decode_jpeg_fixed(io.BytesIO(bad), 40, allow_native=False))


def test_env_gate_disables_native(monkeypatch):
    monkeypatch.setenv('SAV_TPU_NO_NATIVE', '1')
    monkeypatch.setattr(native, '_lib', None)
    monkeypatch.setattr(native, '_lib_failed', False)
    assert native.decode_jpeg_fixed_native(_jpeg_bytes(), 32) is None
    # decode_jpeg_fixed still works via PIL
    out = decode_jpeg_fixed(io.BytesIO(_jpeg_bytes()), 32)
    assert out.shape == (32, 32, 3)
