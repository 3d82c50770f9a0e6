"""Op-level parity tests vs torch CPU.

The reference treats its pure-PyTorch `_ref` formulas as golden
(SURVEY.md §3.5); torch (CPU) is available in the test environment, so
every spi_tpu op is checked directly against the equivalent torch
composition on random inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from spi_tpu import ops
from spi_tpu.ops.bias_act import activation_funcs


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def torch_upfirdn2d_ref(x, f, up=1, down=1, padding=(0, 0, 0, 0), flip_filter=False, gain=1.0):
    """Independent torch composition of the upfirdn2d spec
    (pad -> zero-upsample -> FIR -> downsample)."""
    x = torch.from_numpy(x)
    f = torch.from_numpy(np.asarray(f, dtype=np.float32))
    if f.ndim == 1:
        f = torch.outer(f, f)
    batch, ch, h, w = x.shape
    upx = upy = up
    downx = downy = down
    padx0, padx1, pady0, pady1 = padding
    # zero-upsample (zeros appended after each pixel)
    x = x.reshape(batch, ch, h, 1, w, 1)
    x = F.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape(batch, ch, h * upy, w * upx)
    # pad / crop
    x = F.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    x = x[
        :,
        :,
        max(-pady0, 0) : x.shape[2] - max(-pady1, 0),
        max(-padx0, 0) : x.shape[3] - max(-padx1, 0),
    ]
    # FIR filter
    f = f * (gain)
    if not flip_filter:
        f = f.flip([0, 1])
    kernel = f[None, None].repeat(ch, 1, 1, 1)
    x = F.conv2d(x, kernel, groups=ch)
    # downsample
    x = x[:, :, ::downy, ::downx]
    return x.numpy()


BINOMIAL = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)


class TestUpfirdn2d:
    @pytest.mark.parametrize("up,down,pad", [
        (1, 1, (1, 1, 1, 1)),
        (2, 1, (2, 1, 2, 1)),
        (1, 2, (1, 1, 1, 1)),
        (2, 2, (2, 2, 2, 2)),
        (1, 1, (-1, 2, 0, -1)),
        (4, 1, (3, 2, 3, 2)),
    ])
    def test_parity(self, up, down, pad):
        x = _rand(2, 3, 16, 16, seed=up * 10 + down)
        f = ops.setup_filter(BINOMIAL)
        want = torch_upfirdn2d_ref(x, f, up=up, down=down, padding=pad)
        got = np.asarray(ops.upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=pad))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_identity_filter(self):
        x = _rand(1, 2, 8, 8)
        got = np.asarray(ops.upfirdn2d(jnp.asarray(x), None))
        np.testing.assert_allclose(got, x, rtol=1e-6, atol=1e-6)

    def test_gain_and_flip(self):
        x = _rand(1, 2, 8, 8, seed=3)
        f = np.array([[0.25, 0.5], [0.125, 0.125]], dtype=np.float32)
        want = torch_upfirdn2d_ref(x, f, padding=(1, 0, 1, 0), flip_filter=True, gain=2.0)
        got = np.asarray(
            ops.upfirdn2d(jnp.asarray(x), f, padding=(1, 0, 1, 0), flip_filter=True, gain=2.0)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_upsample2d_matches_torch_shape_and_mass(self):
        x = _rand(1, 3, 8, 8, seed=7)
        f = ops.setup_filter(BINOMIAL)
        y = np.asarray(ops.upsample2d(jnp.asarray(x), f))
        assert y.shape == (1, 3, 16, 16)
        # gain=up^2 preserves mean signal magnitude
        np.testing.assert_allclose(y.mean(), x.mean(), rtol=0.2, atol=0.02)


class TestConv:
    @pytest.mark.parametrize("stride,padding,groups", [(1, 1, 1), (2, 1, 1), (1, 0, 2)])
    def test_conv2d(self, stride, padding, groups):
        x = _rand(2, 4, 12, 12, seed=1)
        w = _rand(6, 4 // groups, 3, 3, seed=2)
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=stride, padding=padding, groups=groups).numpy()
        got = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=padding, groups=groups))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("stride,padding,groups", [(2, 0, 1), (2, 1, 1), (2, 1, 2)])
    def test_conv_transpose2d(self, stride, padding, groups):
        x = _rand(2, 4, 9, 9, seed=3)
        w = _rand(4, 6 // groups, 3, 3, seed=4)
        want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), stride=stride, padding=padding, groups=groups).numpy()
        got = np.asarray(ops.conv_transpose2d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=padding, groups=groups))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_conv2d_resample_plain(self):
        x = _rand(1, 8, 16, 16, seed=5)
        w = _rand(16, 8, 3, 3, seed=6)
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
        got = np.asarray(ops.conv2d_resample(jnp.asarray(x), jnp.asarray(w), padding=1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_conv2d_resample_up2(self):
        """up=2 modulated-conv path: transpose conv + FIR, vs explicit torch
        composition (zero-upsample conv via conv_transpose + blur)."""
        x = _rand(1, 8, 8, 8, seed=7)
        w = _rand(16, 8, 3, 3, seed=8)
        f = ops.setup_filter(BINOMIAL)
        got = np.asarray(
            ops.conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, up=2, padding=1, flip_weight=False)
        )
        # torch composition: conv_transpose2d(stride 2) then upfirdn blur.
        wt = torch.from_numpy(w).transpose(0, 1)
        xt = F.conv_transpose2d(torch.from_numpy(x), wt, stride=2)
        # padding math mirrored from the spec for k=3,up=2,f=4,p=1:
        # px0 = 1+ (4+1)//2 -3+1 = 1, px1 = 1 + (4-2)//2 - 3 + 2 = 1
        y = torch_upfirdn2d_ref(xt.numpy(), f, padding=(1, 1, 1, 1), gain=4.0)
        assert got.shape == (1, 16, 16, 16)
        np.testing.assert_allclose(got, y, rtol=1e-4, atol=1e-4)

    def test_conv2d_resample_down2(self):
        x = _rand(1, 8, 16, 16, seed=9)
        w = _rand(16, 8, 3, 3, seed=10)
        f = ops.setup_filter(BINOMIAL)
        got = np.asarray(ops.conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, down=2, padding=1))
        # torch composition: blur then strided conv.
        # spec padding for k=3, down=2, 4-tap f, p=1: px0 = 1+(4-2+1)//2 = 2, px1 = 1+(4-2)//2 = 2
        xt = torch_upfirdn2d_ref(x, f, padding=(2, 2, 2, 2))
        want = F.conv2d(torch.from_numpy(xt), torch.from_numpy(w), stride=2).numpy()
        assert got.shape == (1, 16, 8, 8)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestBiasAct:
    @pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "softplus", "swish"])
    def test_parity(self, act):
        x = _rand(4, 8, 5, 5, seed=11)
        b = _rand(8, seed=12)
        tx = torch.from_numpy(x)
        tb = torch.from_numpy(b).reshape(1, -1, 1, 1)
        table = {
            "linear": lambda v: v,
            "relu": lambda v: F.relu(v),
            "lrelu": lambda v: F.leaky_relu(v, 0.2),
            "tanh": torch.tanh,
            "sigmoid": torch.sigmoid,
            "softplus": F.softplus,
            "swish": lambda v: torch.sigmoid(v) * v,
        }
        gain = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}.get(act, 1.0)
        want = (table[act](tx + tb) * gain).numpy()
        got = np.asarray(ops.bias_act(jnp.asarray(x), jnp.asarray(b), act=act))
        # XLA and torch use different fp32 transcendental approximations.
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_clamp_and_gain(self):
        x = _rand(2, 4, seed=13) * 10
        got = np.asarray(ops.bias_act(jnp.asarray(x), act="linear", gain=3.0, clamp=5.0))
        want = np.clip(x * 3.0, -5.0, 5.0)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestGridSample:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_parity_inbounds_and_oob(self, seed):
        rng = np.random.RandomState(seed)
        x = rng.randn(2, 5, 9, 7).astype(np.float32)
        grid = (rng.rand(2, 6, 8, 2).astype(np.float32) * 3.0 - 1.5)  # includes OOB
        want = F.grid_sample(
            torch.from_numpy(x), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        ).numpy()
        got = np.asarray(ops.grid_sample(jnp.asarray(x), jnp.asarray(grid)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        import jax

        x = jnp.asarray(_rand(1, 2, 8, 8, seed=20))
        grid = jnp.asarray(_rand(1, 4, 4, 2, seed=21) * 0.5)

        def loss(x, g):
            return ops.grid_sample(x, g).sum()

        gx, gg = jax.grad(loss, argnums=(0, 1))(x, grid)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(gg)).all()
        assert np.abs(np.asarray(gg)).sum() > 0


class TestResize:
    def test_area_512_to_256_equiv(self):
        x = _rand(1, 3, 16, 16, seed=30)
        want = F.interpolate(torch.from_numpy(x), size=(8, 8), mode="area").numpy()
        got = np.asarray(ops.resize_area(jnp.asarray(x), (8, 8)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_bilinear_no_antialias(self):
        x = _rand(1, 3, 8, 8, seed=31)
        want = F.interpolate(torch.from_numpy(x), size=(16, 16), mode="bilinear", align_corners=False).numpy()
        got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (16, 16)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bilinear_downscale_antialias(self):
        x = _rand(1, 3, 32, 32, seed=32)
        want = F.interpolate(
            torch.from_numpy(x), size=(16, 16), mode="bilinear", align_corners=False, antialias=True
        ).numpy()
        got = np.asarray(ops.resize_bilinear(jnp.asarray(x), (16, 16), antialias=True))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestBiasActPallas:
    """impl='pallas' parity vs the XLA path (the reference pairs its CUDA
    kernel against _bias_act_ref the same way, bias_act.py:85-88)."""


    @pytest.mark.parametrize("act", sorted(activation_funcs))
    def test_value_parity(self, act):
        from spi_tpu.ops.bias_act import bias_act

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (2, 16, 8, 8)) * 3.0
        b = jax.random.normal(k2, (16,))
        ref = bias_act(x, b, act=act, gain=1.7, clamp=2.5)
        out = bias_act(x, b, act=act, gain=1.7, clamp=2.5, impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize("act", ["lrelu", "tanh", "softplus", "swish", "selu"])
    def test_grad_parity(self, act):
        from spi_tpu.ops.bias_act import bias_act

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        x = jax.random.normal(k1, (4, 8, 4, 4))
        b = jax.random.normal(k2, (8,))
        ct = jax.random.normal(k3, (4, 8, 4, 4))

        def loss(impl):
            def f(x, b):
                return jnp.sum(bias_act(x, b, act=act, gain=1.3, clamp=2.0, impl=impl) * ct)

            return jax.grad(f, argnums=(0, 1))(x, b)

        gx_ref, gb_ref = loss("xla")
        gx, gb = loss("pallas")
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), atol=1e-5)

    def test_no_bias_and_dims(self):
        from spi_tpu.ops.bias_act import bias_act

        x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 16))
        ref = bias_act(x, None, dim=2, act="lrelu")
        out = bias_act(x, None, dim=2, act="lrelu", impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
