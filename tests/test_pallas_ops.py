"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mgnet_tpu.losses.photometric import _photometric
from mgnet_tpu.ops.pallas.ssim import fused_photometric_residual

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("shape", [(1, 64, 128, 3), (2, 130, 200, 3)])
def test_fused_photometric_matches_reference(shape):
    x = jnp.asarray(RNG.rand(*shape), jnp.float32)
    y = jnp.asarray(RNG.rand(*shape), jnp.float32)
    ref = _photometric(x, y, 0.85)
    out = fused_photometric_residual(x, y, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fallback_path():
    x = jnp.asarray(RNG.rand(1, 32, 32, 3), jnp.float32)
    y = jnp.asarray(RNG.rand(1, 32, 32, 3), jnp.float32)
    out = fused_photometric_residual(x, y, use_pallas=False)
    ref = _photometric(x, y, 0.85)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fused_photometric_gradient():
    """Custom VJP matches the XLA reference gradient."""
    import jax

    x = jnp.asarray(RNG.rand(1, 32, 48, 3), jnp.float32)
    y = jnp.asarray(RNG.rand(1, 32, 48, 3), jnp.float32)

    g_pallas = jax.grad(
        lambda a: jnp.sum(fused_photometric_residual(
            a, y, use_pallas=True, interpret=True))
    )(x)
    g_ref = jax.grad(
        lambda a: jnp.sum(_photometric(a, y, 0.85))
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_ref), atol=1e-5
    )


def test_center_argmin_matches_xla_path():
    from mgnet_tpu.ops.pallas.center_argmin import center_argmin

    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.uniform(0, 64, (40, 72, 2)), jnp.float32)
    centers = jnp.asarray(rng.uniform(0, 64, (16, 2)), jnp.float32)
    valid = jnp.asarray(rng.rand(16) > 0.25)
    out = center_argmin(pts, centers, valid, interpret=True)
    cs = np.where(np.asarray(valid)[:, None], np.asarray(centers), 1e12)
    d = ((np.asarray(pts)[:, :, None, :] - cs[None, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(out), d.argmin(-1))
