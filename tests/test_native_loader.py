"""Tests for the native C++ image pipeline (native/spi_io.cpp via
spi_tpu/data/native_loader.py)."""

import io

import numpy as np
import pytest
from PIL import Image

from spi_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native lib not built"
)


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


class TestDecode:
    def test_png_roundtrip_matches_pil(self):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (32, 32, 3), np.uint8)
        out = native_loader.decode_image(_png_bytes(arr), 32)
        assert out is not None and out.shape == (3, 32, 32)
        # PNG is lossless + no resize -> exact value match
        ref = arr.astype(np.float32).transpose(2, 0, 1) / 127.5 - 1.0
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_jpeg_decode_close_to_pil(self):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
        data = _jpg_bytes(arr)
        out = native_loader.decode_image(data, 64)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float32)
        ref = ref.transpose(2, 0, 1) / 127.5 - 1.0
        assert out is not None
        # decoders may differ by a few LSBs of IDCT rounding
        assert np.abs(out - ref).mean() < 0.02

    def test_resize_bilinear_matches_framework(self):
        arr = np.zeros((64, 64, 3), np.uint8)
        arr[:32] = 200
        out = native_loader.decode_image(_png_bytes(arr), 32)

        import jax.numpy as jnp

        from spi_tpu.ops import resize_bilinear

        x = jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)[None] / 127.5 - 1.0
        ref = np.asarray(resize_bilinear(x, (32, 32))[0])
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_garbage_returns_none(self):
        assert native_loader.decode_image(b"not an image", 16) is None


class TestLoader:
    def test_prefetch_batches(self, tmp_path):
        rng = np.random.default_rng(2)
        paths = []
        for i in range(6):
            arr = rng.integers(0, 255, (16, 16, 3), np.uint8)
            p = tmp_path / f"{i}.png"
            Image.fromarray(arr).save(p)
            paths.append(str(p))
        loader = native_loader.NativeLoader(
            paths, out_size=16, batch=4, n_threads=2, shuffle=False
        )
        imgs, idx = loader.next()
        assert imgs.shape == (4, 3, 16, 16)
        assert (idx >= 0).all()
        assert imgs.min() >= -1.0 and imgs.max() <= 1.0
        # multiple batches cycle without blocking forever
        for _ in range(3):
            imgs, idx = loader.next()
        loader.close()

    def test_bad_file_marked_negative(self, tmp_path):
        good = tmp_path / "a.png"
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(good)
        bad = tmp_path / "b.png"
        bad.write_bytes(b"broken")
        loader = native_loader.NativeLoader(
            [str(good), str(bad)], out_size=8, batch=2, n_threads=1, shuffle=False
        )
        imgs, idx = loader.next()
        assert (idx < 0).sum() == 1
        bad_slot = int(np.where(idx < 0)[0][0])
        np.testing.assert_allclose(imgs[bad_slot], 0.0)
        loader.close()
