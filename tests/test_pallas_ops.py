"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax
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


@pytest.mark.parametrize("shape", [(1, 40, 56, 3), (2, 130, 200, 3)])
def test_fused_photometric_bwd_kernel_exact(shape):
    """The fused Pallas BACKWARD (ops/pallas/ssim._bwd_batched) must match
    the XLA autodiff of the reference residual for both inputs under a
    non-uniform upstream cotangent — including the reflect-pad fold at the
    borders and the L1 sign term — at odd, non-lane-aligned shapes."""
    import jax

    from mgnet_tpu.ops.pallas.ssim import _bwd_batched

    x = jnp.asarray(RNG.rand(*shape), jnp.float32)
    y = jnp.asarray((RNG.rand(*shape) * 0.9 + 0.05), jnp.float32)
    g = jnp.asarray(RNG.randn(shape[0], shape[1], shape[2], 1), jnp.float32)

    _, vjp = jax.vjp(lambda a, b: _photometric(a, b, 0.85), x, y)
    dx_ref, dy_ref = vjp(g)

    dx, dy = _bwd_batched(x, y, g, 0.85, 1e-4, 9e-4, interpret=True)
    scale = float(jnp.max(jnp.abs(dx_ref))) + 1e-12
    np.testing.assert_allclose(np.asarray(dx) / scale,
                               np.asarray(dx_ref) / scale, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dy) / scale,
                               np.asarray(dy_ref) / scale, atol=2e-5)


def _sfm_coords(b, h, w, scale=1.0, jitter=0.5, shift=(0.0, 0.0), seed=0):
    """SfM-like warp coordinates: radial scale + shift + gaussian jitter."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    x_src = cx + (xx - cx) * scale + shift[0]
    y_src = cy + (yy - cy) * scale + shift[1]
    x_src = x_src + rng.randn(b, h, w).astype(np.float32) * jitter
    y_src = y_src + rng.randn(b, h, w).astype(np.float32) * jitter
    return jnp.asarray(np.stack(
        [2 * x_src / (w - 1) - 1, 2 * y_src / (h - 1) - 1],
        axis=-1).astype(np.float32))


@pytest.mark.parametrize(
    "name,kw",
    [
        ("identity", dict(scale=1.0, jitter=0.0)),
        ("subpixel", dict(scale=1.0, jitter=0.0, shift=(0.3, -0.7))),
        ("integer", dict(scale=1.0, jitter=0.0, shift=(3.0, 2.0))),
        ("sfm", dict(scale=1.05, jitter=0.5)),
        ("violators", dict(scale=1.0, jitter=6.0)),
        ("off_image", dict(scale=1.0, jitter=0.3, shift=(500.0, 20.0))),
    ],
)
def test_banded_warp_matches_xla(name, kw):
    """Banded-matmul warp kernel == XLA grid_sample core (value AND the
    gx/gy derivative fields), including violator correction, integer
    coordinates and fully off-image pixels (torch zeros semantics)."""
    from mgnet_tpu.geometry.image import _grid_sample_core
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    b, h, w, c = 1, 32, 512, 3
    img = jnp.asarray(RNG.rand(b, h, w, c), jnp.float32)
    coords = _sfm_coords(b, h, w, **kw)
    ref, rgx, rgy = _grid_sample_core(img, coords, "zeros", True)
    out, gx, gy = warp_bilinear_banded(
        img, coords, "zeros", with_grads=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rgx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(rgy), atol=2e-4)


def test_banded_warp_guard_fallback():
    """When violators exceed the static budget the lax.cond guard
    reproduces the full XLA sampler exactly (any-input exactness)."""
    from mgnet_tpu.geometry.image import _grid_sample_core
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    b, h, w, c = 1, 32, 512, 3
    img = jnp.asarray(RNG.rand(b, h, w, c), jnp.float32)
    # uniform-random coords: nearly every pixel violates its tile band
    rng = np.random.RandomState(3)
    coords = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2)), jnp.float32)
    ref, _, _ = _grid_sample_core(img, coords, "zeros", True)
    out = warp_bilinear_banded(
        img, coords, "zeros", with_grads=False, correction_k=128,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grid_sample_pallas_dispatch_falls_back_off_tpu():
    """use_pallas=True on CPU must silently use the XLA path (and the
    custom VJP must keep matching torch-convention gradients)."""
    import jax

    from mgnet_tpu.geometry.image import grid_sample

    b, h, w, c = 1, 32, 512, 3
    img = jnp.asarray(RNG.rand(b, h, w, c), jnp.float32)
    coords = _sfm_coords(b, h, w, scale=1.02, jitter=0.4)
    ref = grid_sample(img, coords, "zeros", False)
    out = grid_sample(img, coords, "zeros", True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    g_ref = jax.grad(
        lambda co: jnp.sum(grid_sample(img, co, "zeros", False) ** 2)
    )(coords)
    g_pal = jax.grad(
        lambda co: jnp.sum(grid_sample(img, co, "zeros", True) ** 2)
    )(coords)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-5)


def test_center_argmin_matches_xla_path():
    from mgnet_tpu.ops.pallas.center_argmin import center_argmin

    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.uniform(0, 64, (40, 72, 2)), jnp.float32)
    centers = jnp.asarray(rng.uniform(0, 64, (16, 2)), jnp.float32)
    valid = jnp.asarray(rng.rand(16) > 0.25)
    cs = np.where(np.asarray(valid)[:, None], np.asarray(centers), 1e12)
    d = ((np.asarray(pts)[:, :, None, :] - cs[None, None]) ** 2).sum(-1)
    for variant in ("broadcast", "kloop"):
        out = center_argmin(pts, centers, valid, interpret=True,
                            variant=variant)
        np.testing.assert_array_equal(np.asarray(out), d.argmin(-1))


def test_center_argmin_kloop_vmap():
    """vmap routes through the custom_vmap rule (the generic pallas
    batching rule compiles pathologically slowly on TPU — 198 s even at
    64x256); exactness must hold for batched AND broadcast operands."""
    from mgnet_tpu.ops.pallas.center_argmin import center_argmin

    rng = np.random.RandomState(3)
    b = 3
    pts = jnp.asarray(rng.uniform(0, 64, (b, 40, 72, 2)), jnp.float32)
    centers = jnp.asarray(rng.uniform(0, 64, (b, 16, 2)), jnp.float32)
    valid = jnp.asarray(rng.rand(b, 16) > 0.25)

    fn = lambda p, c, v: center_argmin(p, c, v, interpret=True,
                                       variant="kloop")
    out = jax.vmap(fn)(pts, centers, valid)
    for i in range(b):
        cs = np.where(np.asarray(valid)[i][:, None],
                      np.asarray(centers)[i], 1e12)
        d = ((np.asarray(pts)[i][:, :, None, :]
              - cs[None, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(out)[i], d.argmin(-1))

    # unbatched centers broadcast across the mapped axis
    out_bc = jax.vmap(lambda p: fn(p, centers[0], valid[0]))(pts)
    for i in range(b):
        ref = fn(pts[i], centers[0], valid[0])
        np.testing.assert_array_equal(np.asarray(out_bc)[i],
                                      np.asarray(ref))


def test_banded_warp_depth_edge_tier_b():
    """A strong vertical depth edge (near-object boundary: disparity jump
    of ~200 px crossing every image row) floods the raster-group tier —
    exactly the real-frame case that must route to the per-pixel top_k
    tier, not the full-sampler guard — and stays exact (value + grads)."""
    from mgnet_tpu.geometry.image import _grid_sample_core
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    from mgnet_tpu.ops.pallas.warp import _tile_bases

    b, h, w, c = 1, 64, 512, 3
    img = jnp.asarray(RNG.rand(b, h, w, c), jnp.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # object boundary at x=300: left side flows far left, right side
    # right — within one 8x128 tile the needed source span exceeds the
    # 384-px band window however it is aligned
    disparity = np.where(xx < 300, -280.0, 50.0)
    x_src = np.clip(xx + disparity, 0.0, w - 2.0)
    y_src = yy + 0.3
    coords = jnp.asarray(np.stack(
        [2 * x_src / (w - 1) - 1, 2 * y_src / (h - 1) - 1],
        axis=-1)[None].astype(np.float32))
    # self-check the scenario: violators flood the raster groups (the
    # group tier cannot hold) but stay under the per-pixel budget
    xp = jnp.asarray(x_src)[None]
    yp = jnp.asarray(y_src)[None]
    _, _, viol = _tile_bases(xp, yp, h, w)
    gcount = np.asarray(viol).reshape(1, -1, 128).sum(-1)
    assert (gcount > 0).sum() > 16, "edge too weak to leave tier A"
    assert int(np.asarray(viol).sum()) <= 8192, "would hit the full guard"
    ref, rgx, rgy = _grid_sample_core(img, coords, "zeros", True)
    out, gx, gy = warp_bilinear_banded(
        img, coords, "zeros", with_grads=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rgx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(rgy), atol=2e-4)


def test_banded_warp_fast_mode_error_bound():
    """bf16x2 'fast' band split (PALLAS_WARP_FAST): on unit-range images
    (the photometric loss's input range) values stay within 2e-5 of the
    XLA core and the derivative fields within 1e-4 in PER-PIXEL units —
    the normalized-coord fields scale by (w-1)/2, so an absolute bound
    on gx/gy directly would just re-measure that constant."""
    from mgnet_tpu.geometry.image import _grid_sample_core
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    b, h, w, c = 1, 32, 512, 3
    sx, sy = (w - 1) / 2.0, (h - 1) / 2.0
    img = jnp.asarray(RNG.rand(b, h, w, c), jnp.float32)
    for kw in (dict(scale=1.05, jitter=0.5), dict(scale=1.0, jitter=6.0)):
        coords = _sfm_coords(b, h, w, **kw)
        ref, rgx, rgy = _grid_sample_core(img, coords, "zeros", True)
        out, gx, gy = warp_bilinear_banded(
            img, coords, "zeros", with_grads=True, band_terms=2,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(gx) / sx,
                                   np.asarray(rgx) / sx, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy) / sy,
                                   np.asarray(rgy) / sy, atol=1e-4)


# ---------------------------------------------------------------------------
# Channel-planar paths (round 5: the loss keeps full-res tensors
# [B, C, H, W] end to end so no NHWC relayout sits between the warp and
# SSIM kernels). Planar must be a pure layout change: identical bits vs
# the NHWC path for values AND gradients.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 64, 128, 3), (2, 130, 200, 3)])
def test_fused_photometric_planar_matches_nhwc(shape):
    x = jnp.asarray(RNG.rand(*shape), jnp.float32)
    y = jnp.asarray(RNG.rand(*shape), jnp.float32)
    ref = fused_photometric_residual(x, y, use_pallas=True, interpret=True)
    out = fused_photometric_residual(
        x.transpose(0, 3, 1, 2), y.transpose(0, 3, 1, 2),
        use_pallas=True, interpret=True, planar=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # XLA fallback planar path too
    ref2 = fused_photometric_residual(x, y, use_pallas=False)
    out2 = fused_photometric_residual(
        x.transpose(0, 3, 1, 2), y.transpose(0, 3, 1, 2),
        use_pallas=False, planar=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-6)


def test_fused_photometric_planar_gradient_matches_nhwc():
    import jax

    x = jnp.asarray(RNG.rand(1, 40, 56, 3), jnp.float32)
    y = jnp.asarray(RNG.rand(1, 40, 56, 3), jnp.float32)
    g_nhwc = jax.grad(lambda a: jnp.sum(fused_photometric_residual(
        a, y, use_pallas=True, interpret=True) ** 2))(x)
    g_pl = jax.grad(lambda a: jnp.sum(fused_photometric_residual(
        a, y.transpose(0, 3, 1, 2), use_pallas=True, interpret=True,
        planar=True) ** 2))(x.transpose(0, 3, 1, 2))
    np.testing.assert_array_equal(
        np.asarray(g_pl.transpose(0, 2, 3, 1)), np.asarray(g_nhwc))


@pytest.mark.parametrize(
    "name,kw",
    [
        ("sfm", dict(scale=1.05, jitter=0.5)),
        ("violators", dict(scale=1.0, jitter=6.0)),
    ],
)
def test_banded_warp_planar_matches_nhwc(name, kw):
    """planar=True is a pure layout change of the banded warp kernel:
    bit-identical values/fields vs the NHWC path, including the
    violator-correction scatter."""
    from mgnet_tpu.ops.pallas.warp import warp_bilinear_banded

    b, h, w, c = 1, 32, 512, 3
    img = jnp.asarray(RNG.rand(b, h, w, c), jnp.float32)
    coords = _sfm_coords(b, h, w, **kw)
    ref, rgx, rgy = warp_bilinear_banded(
        img, coords, "zeros", with_grads=True, interpret=True)
    out, gx, gy = warp_bilinear_banded(
        img.transpose(0, 3, 1, 2), coords, "zeros", with_grads=True,
        interpret=True, planar=True)
    for a, r in ((out, ref), (gx, rgx), (gy, rgy)):
        np.testing.assert_array_equal(
            np.asarray(a.transpose(0, 2, 3, 1)), np.asarray(r))


def test_grid_sample_planar_matches_nhwc():
    """grid_sample_planar == grid_sample (values and coords gradient)
    on the XLA fallback path."""
    import jax

    from mgnet_tpu.geometry.image import grid_sample, grid_sample_planar

    b, h, w, c = 2, 24, 40, 3
    img = jnp.asarray(RNG.rand(b, h, w, c), jnp.float32)
    coords = jnp.asarray(RNG.uniform(-1, 1, (b, h, w, 2)), jnp.float32)

    ref = grid_sample(img, coords, "zeros")
    out = grid_sample_planar(img.transpose(0, 3, 1, 2), coords, "zeros")
    np.testing.assert_array_equal(
        np.asarray(out.transpose(0, 2, 3, 1)), np.asarray(ref))

    g_ref = jax.grad(lambda cc: jnp.sum(
        grid_sample(img, cc, "zeros") ** 2))(coords)
    g_pl = jax.grad(lambda cc: jnp.sum(grid_sample_planar(
        img.transpose(0, 3, 1, 2), cc, "zeros") ** 2))(coords)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=1e-6)
    g_img_ref = jax.grad(lambda im: jnp.sum(
        grid_sample(im, coords, "zeros") ** 2))(img)
    g_img_pl = jax.grad(lambda im: jnp.sum(grid_sample_planar(
        im, coords, "zeros") ** 2))(img.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(g_img_pl.transpose(0, 2, 3, 1)), np.asarray(g_img_ref),
        atol=1e-6)
