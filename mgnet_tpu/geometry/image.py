"""Image-space utilities: grids, gradients, resizes, and bilinear sampling.

Behavioral parity with reference: mgnet/geometry/image.py (meshgrid,
image_grid, gradient_x/y, interpolate_image, match_scales) and with
torch.nn.functional.grid_sample(align_corners=True, padding zeros/border)
used at reference: mgnet/geometry/camera_utils.py:52-54.

TPU-first design notes:
* All tensors are NHWC.
* ``interpolate_bilinear`` implements torch's align_corners=True bilinear
  resize as two separable matmuls — the interpolation weights become small
  dense matrices that XLA maps onto the MXU instead of gathers.
* ``grid_sample`` is a vectorized 4-neighbor gather formulated as one
  flat take-along-axis per corner, fusing cleanly under XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "image_grid",
    "gradient_x",
    "gradient_y",
    "interpolate_bilinear",
    "interpolate_nearest",
    "match_scales",
    "grid_sample",
    "grid_sample_planar",
]


def image_grid(batch: int, height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid [B, H, W, 3] with channels (x, y, 1).

    Parity: reference mgnet/geometry/image.py:138-199 (meshgrid/image_grid,
    non-normalized variant), transposed to NHWC.
    """
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    grid_x = jnp.broadcast_to(xs[None, :], (height, width))
    grid_y = jnp.broadcast_to(ys[:, None], (height, width))
    ones = jnp.ones((height, width), dtype=dtype)
    grid = jnp.stack([grid_x, grid_y, ones], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, height, width, 3))


def gradient_x(image: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along width. [B,H,W,C] -> [B,H,W-1,C].

    Parity: reference mgnet/geometry/image.py gradient_x.
    """
    return image[:, :, :-1, :] - image[:, :, 1:, :]


def gradient_y(image: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along height. [B,H,W,C] -> [B,H-1,W,C]."""
    return image[:, :-1, :, :] - image[:, 1:, :, :]


def _align_corners_weights(in_size: int, out_size: int, dtype) -> np.ndarray:
    """Dense [out, in] bilinear interpolation matrix, align_corners=True.

    out[i] = sum_j W[i, j] * in[j] reproduces
    torch.nn.functional.interpolate(mode='bilinear', align_corners=True)
    along one axis. Computed with numpy at trace time (shapes are static).
    """
    if out_size == in_size:
        return np.eye(out_size, dtype=dtype)
    if in_size == 1:
        return np.ones((out_size, 1), dtype=dtype)
    if out_size == 1:
        w = np.zeros((1, in_size), dtype=dtype)
        w[0, 0] = 1.0
        return w
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = src - lo
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    w[rows, lo] = 1.0 - frac
    w[rows, lo + 1] = frac
    return w.astype(dtype)


def interpolate_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True semantics, NHWC.

    Parity: torch F.interpolate(..., mode='bilinear', align_corners=True)
    used throughout the reference (e.g. mgnet/modeling/mg_net.py:599,678-687).

    Implemented as two separable dense matmuls so the resize runs on the
    MXU: out = Wh @ x @ Ww^T applied per batch/channel.
    """
    out_h, out_w = size
    b, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    f32 = jnp.float32
    wh = jnp.asarray(_align_corners_weights(in_h, out_h, np.float32))
    ww = jnp.asarray(_align_corners_weights(in_w, out_w, np.float32))
    y = x.astype(f32)
    # [out_h, in_h] x [B, in_h, in_w, C] -> [B, out_h, in_w, C]
    y = jnp.einsum("ph,bhwc->bpwc", wh, y, preferred_element_type=f32)
    # [out_w, in_w] x [B, out_h, in_w, C] -> [B, out_h, out_w, C]
    y = jnp.einsum("qw,bpwc->bpqc", ww, y, preferred_element_type=f32)
    return y.astype(dtype)


def interpolate_bilinear_cf(x: jnp.ndarray,
                            size: tuple[int, int]) -> jnp.ndarray:
    """interpolate_bilinear for channel-first [B, C, H, W] tensors.

    Upsampling many-channel maps channel-first keeps the reduction of a
    following argmax/softmax off the minor dimension (a minor-dim C=20
    argmax at 1024x2048 costs 7.5 ms on v5e vs 2.2 channel-first, and
    this variant also skips the full-resolution NHWC->NCHW transpose).

    Contract note: unlike ``interpolate_bilinear`` this returns float32
    regardless of the input dtype — callers (fused argmax/softmax paths)
    want the f32 weights anyway, and casting back would add a relayout.
    """
    out_h, out_w = size
    b, c, in_h, in_w = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    f32 = jnp.float32
    wh = jnp.asarray(_align_corners_weights(in_h, out_h, np.float32))
    ww = jnp.asarray(_align_corners_weights(in_w, out_w, np.float32))
    y = x.astype(f32)
    y = jnp.einsum("ph,bchw->bcpw", wh, y, preferred_element_type=f32)
    y = jnp.einsum("qw,bcpw->bcpq", ww, y, preferred_element_type=f32)
    return y


def interpolate_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize matching torch F.interpolate(mode='nearest').

    Parity: reference decoder upsampling, mgnet/modeling/layers.py:90 and
    GCM upsample mgnet/modeling/layers.py:217. torch nearest picks
    src = floor(dst * in/out).
    """
    out_h, out_w = size
    b, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    idx_h = jnp.asarray((np.arange(out_h) * in_h // out_h).astype(np.int32))
    idx_w = jnp.asarray((np.arange(out_w) * in_w // out_w).astype(np.int32))
    return x[:, idx_h][:, :, idx_w]


def match_scales(image: jnp.ndarray, shapes: list[tuple[int, int]]) -> list[jnp.ndarray]:
    """Resize ``image`` to each (H, W) in ``shapes`` (bilinear align-corners).

    Parity: reference mgnet/geometry/image.py match_scales.
    """
    return [interpolate_bilinear(image, s) for s in shapes]


def _grid_sample_core(image: jnp.ndarray, coords: jnp.ndarray,
                      padding_mode: str, want_grads: bool):
    """Shared forward math: bilinear sample + (optionally) the spatial
    derivative fields d(out)/d(coord_x), d(out)/d(coord_y) in NORMALIZED
    coordinate units. The derivative fields are exact byproducts of the
    corner values and make the custom backward pass gather-free."""
    b, h, w, c = image.shape
    _, oh, ow, _ = coords.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def clip_x(v):
        return jnp.clip(v, 0, w - 1).astype(jnp.int32)

    def clip_y(v):
        return jnp.clip(v, 0, h - 1).astype(jnp.int32)

    x0c, x1c, y0c, y1c = clip_x(x0), clip_x(x1), clip_y(y0), clip_y(y1)

    # Four per-corner row gathers. (A single 2x2-patch lax.gather was
    # tried: 13% faster standalone at 2M pixels, but the materialized
    # [B,HW,2,2,C] patch buffers blew the training-step HBM peak from
    # ~14G to 28.6G and OOM'd batch 8 @ 1024^2 — reverted.)
    flat = image.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(b, oh * ow)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(b, oh, ow, c)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    if padding_mode == "zeros":
        # torch zero-pads per corner: a corner outside the image
        # contributes 0 (both to the value and to the derivatives).
        def inb_x(v):
            return (v >= 0) & (v <= w - 1)

        def inb_y(v):
            return (v >= 0) & (v <= h - 1)

        dt = image.dtype
        v00 = v00 * (inb_y(y0) & inb_x(x0)).astype(dt)[..., None]
        v01 = v01 * (inb_y(y0) & inb_x(x1)).astype(dt)[..., None]
        v10 = v10 * (inb_y(y1) & inb_x(x0)).astype(dt)[..., None]
        v11 = v11 * (inb_y(y1) & inb_x(x1)).astype(dt)[..., None]
    elif padding_mode != "border":
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    out = (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
           + v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])
    if not want_grads:
        return out, None, None

    # d out / d x_pix = wy0*(v01-v00) + wy1*(v11-v10); chain the
    # normalized->pixel factor (w-1)/2 in now so the backward pass needs
    # no shape information. In border mode the clipped corners coincide
    # at the boundary (v01==v00), so the derivative vanishes there —
    # matching the a.e. gradient of the clamp.
    sx = (w - 1) * 0.5
    sy = (h - 1) * 0.5
    gx = (wy0[..., None] * (v01 - v00) + wy1[..., None] * (v11 - v10)) * sx
    gy = (wx0[..., None] * (v10 - v00) + wx1[..., None] * (v11 - v01)) * sy
    return out, gx, gy


def _sample_dispatch(image, coords, padding_mode, want_grads, use_pallas):
    """Route one bilinear sample to the banded-matmul Pallas kernel
    (TPU, conforming shapes, zeros mode) or the XLA gather formulation.

    use_pallas: False | True | "fast". True is exact for ANY input
    (bf16x3 band split reconstructs f32 to ~1 ulp; band violators get
    an XLA correction pass and a lax.cond falls back to the full
    sampler over budget). "fast" drops the low bf16 residual term
    (one-third less MXU work, measured 32.5 -> 27.4 ms/warp at
    8x1024²): value error <= ~2^-17 * max|image| ≈ 4e-6 for the
    unit-range images of the photometric loss — the product train path
    default (MODEL.DEPTH_HEAD.PALLAS_WARP_FAST)."""
    if use_pallas:
        from mgnet_tpu.ops.pallas.warp import (
            pallas_warp_supported,
            warp_bilinear_banded,
        )

        if pallas_warp_supported(image.shape, coords.shape, padding_mode):
            terms = 2 if use_pallas == "fast" else 3
            if want_grads:
                return warp_bilinear_banded(
                    image, coords, padding_mode, with_grads=True,
                    band_terms=terms)
            return (warp_bilinear_banded(
                image, coords, padding_mode, with_grads=False,
                band_terms=terms), None, None)
    return _grid_sample_core(image, coords, padding_mode, want_grads)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grid_sample(image: jnp.ndarray, coords: jnp.ndarray,
                padding_mode: str = "zeros",
                use_pallas: bool = False) -> jnp.ndarray:
    """Bilinear sampling of ``image`` at normalized ``coords``.

    Parity: torch F.grid_sample(mode='bilinear', align_corners=True)
    (reference: mgnet/geometry/camera_utils.py:52-54).

    Custom VJP (the TPU gather is the training-step floor — BENCH_NOTES
    §Training): the forward also evaluates the exact spatial derivative
    fields gx, gy as elementwise byproducts of the already-gathered
    corner values; the backward w.r.t. ``coords`` is then PURE
    elementwise math (sum_c g*gx) — no re-gather, no 4-corner residual
    tensors. The image cotangent (4 scatter-adds) is only built when a
    caller actually differentiates w.r.t. the sampled image; in the
    photometric loss the context frames are data, so XLA removes it.

    Args:
        image: [B, H, W, C]
        coords: [B, H', W', 2], normalized to [-1, 1], channel order (x, y).
        padding_mode: 'zeros' or 'border'.
        use_pallas: False | True | "fast" — route to the banded-matmul
            TPU kernel when supported (MODEL.DEPTH_HEAD.USE_PALLAS_WARP
            in the product path); see _sample_dispatch for the "fast"
            (bf16x2) error bound.

    Returns:
        [B, H', W', C] sampled image.
    """
    out, _, _ = _sample_dispatch(image, coords, padding_mode, False,
                                 use_pallas)
    return out


def _grid_sample_fwd(image, coords, padding_mode, use_pallas):
    out, gx, gy = _sample_dispatch(image, coords, padding_mode, True,
                                   use_pallas)
    return out, (gx, gy, image, coords)


def _grid_sample_bwd(padding_mode, use_pallas, res, g):
    gx, gy, image, coords = res
    g = g.astype(gx.dtype)
    # coords cotangent: elementwise contraction with the saved fields
    dx = jnp.sum(g * gx, axis=-1)
    dy = jnp.sum(g * gy, axis=-1)
    dcoords = jnp.stack([dx, dy], axis=-1).astype(coords.dtype)

    # image cotangent: scatter-add of the weighted upstream cotangent at
    # the 4 corner sites. Dead code (eliminated by XLA) whenever the
    # caller does not differentiate w.r.t. the image — the standard case
    # here (context frames are inputs, not parameters). Weights/indices
    # are recomputed inline (pure elementwise) so no gather can appear
    # in the backward graph.
    b, h, w, c = image.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    x1, y1 = x0 + 1.0, y0 + 1.0
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1c = jnp.clip(x1, 0, w - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y1, 0, h - 1).astype(jnp.int32)
    if padding_mode == "zeros":
        def inb(vx, vy):
            return ((vx >= 0) & (vx <= w - 1)
                    & (vy >= 0) & (vy <= h - 1)).astype(gx.dtype)

        m00, m01 = inb(x0, y0), inb(x1, y0)
        m10, m11 = inb(x0, y1), inb(x1, y1)
    else:
        one = jnp.ones_like(wx0)
        m00 = m01 = m10 = m11 = one
    dimg = jnp.zeros((b, h * w, c), gx.dtype)
    gf = g.reshape(b, -1, c)

    def scat(acc, yi, xi, wgt):
        idx = (yi * w + xi).reshape(b, -1)
        return acc.at[
            jnp.arange(b)[:, None], idx
        ].add(gf * wgt.reshape(b, -1)[..., None])

    dimg = scat(dimg, y0c, x0c, wy0 * wx0 * m00)
    dimg = scat(dimg, y0c, x1c, wy0 * wx1 * m01)
    dimg = scat(dimg, y1c, x0c, wy1 * wx0 * m10)
    dimg = scat(dimg, y1c, x1c, wy1 * wx1 * m11)
    dimage = dimg.reshape(b, h, w, c).astype(image.dtype)
    return dimage, dcoords


grid_sample.defvjp(_grid_sample_fwd, _grid_sample_bwd)


# ---------------------------------------------------------------------------
# Channel-planar grid_sample: image/outputs [B, C, H, W].
#
# The photometric loss keeps its full-res tensors channel-planar end to
# end (C=3 on the 128-lane minor dim wastes 125/128 of every VPU op, and
# the NHWC<->planar relayouts around the warp/SSIM Pallas kernels were
# the round-5 train-step glue). Same math as grid_sample — the Pallas
# kernel takes planar in/out natively, the XLA fallback transposes at
# the boundary (tests/off-TPU only).
# ---------------------------------------------------------------------------


def _sample_dispatch_planar(image, coords, padding_mode, want_grads,
                            use_pallas):
    b, c, h, w = image.shape
    if use_pallas:
        from mgnet_tpu.ops.pallas.warp import (
            pallas_warp_supported,
            warp_bilinear_banded,
        )

        if pallas_warp_supported((b, h, w, c), coords.shape, padding_mode):
            terms = 2 if use_pallas == "fast" else 3
            if want_grads:
                return warp_bilinear_banded(
                    image, coords, padding_mode, with_grads=True,
                    band_terms=terms, planar=True)
            return (warp_bilinear_banded(
                image, coords, padding_mode, with_grads=False,
                band_terms=terms, planar=True), None, None)
    out, gx, gy = _grid_sample_core(
        image.transpose(0, 2, 3, 1), coords, padding_mode, want_grads)
    out = out.transpose(0, 3, 1, 2)
    if want_grads:
        gx = gx.transpose(0, 3, 1, 2)
        gy = gy.transpose(0, 3, 1, 2)
    return out, gx, gy


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grid_sample_planar(image: jnp.ndarray, coords: jnp.ndarray,
                       padding_mode: str = "zeros",
                       use_pallas: bool = False) -> jnp.ndarray:
    """grid_sample for channel-planar images: [B, C, H, W] in and out.

    coords stay [B, H', W', 2] normalized (x, y). Same gather-free
    custom VJP as grid_sample; the coords cotangent contracts over the
    channel axis (axis 1)."""
    out, _, _ = _sample_dispatch_planar(image, coords, padding_mode, False,
                                        use_pallas)
    return out


def _grid_sample_planar_fwd(image, coords, padding_mode, use_pallas):
    out, gx, gy = _sample_dispatch_planar(image, coords, padding_mode, True,
                                          use_pallas)
    return out, (gx, gy, image, coords)


def _grid_sample_planar_bwd(padding_mode, use_pallas, res, g):
    gx, gy, image, coords = res
    g = g.astype(gx.dtype)
    dx = jnp.sum(g * gx, axis=1)
    dy = jnp.sum(g * gy, axis=1)
    dcoords = jnp.stack([dx, dy], axis=-1).astype(coords.dtype)
    # image cotangent via the NHWC path (DCE'd in the product path —
    # context frames are data, not parameters)
    dimage_nhwc, _ = _grid_sample_bwd(
        padding_mode, use_pallas,
        (gx.transpose(0, 2, 3, 1), gy.transpose(0, 2, 3, 1),
         image.transpose(0, 2, 3, 1), coords),
        g.transpose(0, 2, 3, 1))
    return dimage_nhwc.transpose(0, 3, 1, 2), dcoords


grid_sample_planar.defvjp(_grid_sample_planar_fwd, _grid_sample_planar_bwd)
