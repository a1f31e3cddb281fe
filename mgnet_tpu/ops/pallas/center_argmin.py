"""Pallas TPU kernel: pixel-to-center nearest-neighbor assignment.

The panoptic-fusion clustering step (SURVEY.md §7 hard part #1) assigns
every thing pixel to the closest of K candidate instance centers in
(y + offset_y, x + offset_x) space — the reference does this with a
dynamic [pixels, K] pairwise norm + argmin on CUDA tensors
(reference: mgnet/postprocessing/panoptic_post_proc.py:123-125).

The XLA formulation (postprocessing/panoptic.py::_cluster_pixels)
round-trips [chunk, K] distance blocks through HBM via lax.map —
measured 4.8 ms at 1024x2048 x K=128 on one v5e chip (chained protocol,
tools/bench_center_argmin.py). Both kernels use the expanded form

    argmin_k |p - c_k|^2  ==  argmin_k (|c_k|^2 - 2 p . c_k)

and differ in where K lives:

* ``kloop`` (default, 1.51 ms): centers are SMEM scalars; a fori_loop
  over K keeps a running (min, argmin) carry of two [block_h, W] vregs.
  Per candidate the VPU does 3 FMA-class ops + 2 selects over the
  block — no [block_h, W, K] score tensor is ever formed, so VMEM
  stays at ~2 input planes/block and the row-block DMA pipelines
  cleanly (block_h=8 measured faster than 64/128: 1.51/3.53/2.87 ms).
* ``broadcast`` (3.68 ms): K on the lane dimension, full
  [block_h, W, K] score tensor in VMEM, lane-wise argmin. Kept as the
  A/B reference; the lane-broadcast of the coordinate planes and the
  8x larger live tile lose to the scalar loop.

Tie-breaking: both variants return the LOWEST index among equal
scores (strict < update / jnp.argmin first-occurrence), matching the
XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["center_argmin"]

_BLOCK_H = 8
_BLOCK_H_KLOOP = 8


def _kernel(py_ref, px_ref, cy_ref, cx_ref, c2_ref, out_ref):
    py = py_ref[...]              # [block_h, W]
    px = px_ref[...]
    cy = cy_ref[...]              # [1, K]
    cx = cx_ref[...]
    c2 = c2_ref[...]              # [1, K] = cy^2 + cx^2

    # scores[h, w, k] = |c_k|^2 - 2 * (py*cy_k + px*cx_k)
    scores = (c2[0][None, None, :]
              - 2.0 * (py[:, :, None] * cy[0][None, None, :]
                       + px[:, :, None] * cx[0][None, None, :]))
    out_ref[...] = jnp.argmin(scores, axis=-1).astype(jnp.int32)


def _kernel_kloop(cy_ref, cx_ref, c2_ref, py_ref, px_ref,
                  out_ref, k: int):
    """Scalar-K-loop variant: centers live in SMEM; the running
    (min, argmin) carry stays [block_h, W] — the [block_h, W, K] score
    tensor of ``_kernel`` is never formed, so no lane-broadcast of the
    coordinate planes and 8x less live VMEM per block.

    Block shapes carry a leading unit batch dim: planes [1, block_h, W],
    centers [1, 1, K]."""
    py = py_ref[0]                # [block_h, W]
    px = px_ref[0]

    def body(i, carry):
        best, besti = carry
        cy = cy_ref[0, 0, i]      # SMEM scalars
        cx = cx_ref[0, 0, i]
        c2 = c2_ref[0, 0, i]
        # identical arithmetic to _kernel: c2 - 2*(py*cy + px*cx)
        score = c2 - 2.0 * (py * cy + px * cx)
        pred = score < best
        return (jnp.where(pred, score, best),
                jnp.where(pred, i, besti))

    init = (jnp.full(py.shape, jnp.float32(jnp.inf)),
            jnp.zeros(py.shape, jnp.int32))
    _, besti = jax.lax.fori_loop(0, k, body, init)
    out_ref[0] = besti


def _kloop_call(py, px, cy, cx, c2, *, block_h: int, interpret: bool):
    """Natively batched kloop launch: [B, H, W] planes + [B, K] centers
    → [B, H, W] int32, grid (B, n_row_blocks).

    This exists because jax.vmap's GENERIC pallas batching of the
    unbatched kernel produces a program Mosaic takes minutes to compile
    (>20 min at 1024x2048, 198 s even at 64x256 — measured through the
    relay); the explicit batch grid dim compiles in <1 s. The public
    ``center_argmin`` routes vmap here via a custom_vmap rule."""
    if py.ndim > 3:               # fold nested vmap axes into one batch
        lead = py.shape[:-2]
        out = _kloop_call(py.reshape((-1,) + py.shape[-2:]),
                          px.reshape((-1,) + px.shape[-2:]),
                          cy.reshape((-1, cy.shape[-1])),
                          cx.reshape((-1, cx.shape[-1])),
                          c2.reshape((-1, c2.shape[-1])),
                          block_h=block_h, interpret=interpret)
        return out.reshape(lead + out.shape[-2:])
    b, h, w = py.shape
    k = cy.shape[-1]
    block_h = min(block_h, h)
    n_blocks = -(-h // block_h)
    ph = n_blocks * block_h
    py = jnp.pad(py, ((0, 0), (0, ph - h), (0, 0)))
    px = jnp.pad(px, ((0, 0), (0, ph - h), (0, 0)))
    plane_spec = pl.BlockSpec((1, block_h, w), lambda bb, i: (bb, i, 0),
                              memory_space=pltpu.VMEM)
    center_space = pltpu.ANY if interpret else pltpu.SMEM
    cspec = pl.BlockSpec((1, 1, k), lambda bb, i: (bb, 0, 0),
                         memory_space=center_space)
    out = pl.pallas_call(
        functools.partial(_kernel_kloop, k=k),
        grid=(b, n_blocks),
        in_specs=[cspec, cspec, cspec, plane_spec, plane_spec],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((b, ph, w), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cy[:, None], cx[:, None], c2[:, None], py, px)
    return out[:, :h]


def center_argmin(points_yx: jnp.ndarray, centers_yx: jnp.ndarray,
                  valid: jnp.ndarray, interpret: bool = False,
                  variant: str = "kloop",
                  block_h: int = 0) -> jnp.ndarray:
    """Nearest valid center per pixel.

    Args:
        points_yx: [H, W, 2] float (y, x) target coordinates per pixel.
        centers_yx: [K, 2] float candidate centers.
        valid: [K] bool; invalid centers never win.

    Returns:
        [H, W] int32 indices into centers_yx.
    """
    h, w, _ = points_yx.shape
    k = centers_yx.shape[0]
    big = jnp.float32(1e12)
    cs = jnp.where(valid[:, None], centers_yx.astype(jnp.float32), big)
    cy = cs[:, 0][None]                     # [1, K]
    cx = cs[:, 1][None]
    # clamp |c|^2 so sentinel centers stay finite but dominated
    c2 = jnp.minimum(cy * cy + cx * cx, jnp.float32(1e30))

    py = points_yx[..., 0].astype(jnp.float32)
    px = points_yx[..., 1].astype(jnp.float32)

    block_h = block_h or (_BLOCK_H if variant == "broadcast"
                          else _BLOCK_H_KLOOP)
    block_h = min(block_h, h)

    if variant == "kloop":
        bh = block_h

        @jax.custom_batching.custom_vmap
        def call(py_, px_, cy_, cx_, c2_):
            return _kloop_call(py_[None], px_[None], cy_[None],
                               cx_[None], c2_[None],
                               block_h=bh, interpret=interpret)[0]

        @call.def_vmap
        def _rule(axis_size, in_batched, py_, px_, cy_, cx_, c2_):
            def bc(x, batched):
                return x if batched else jnp.broadcast_to(
                    x, (axis_size,) + x.shape)

            args = [bc(a, bt) for a, bt in
                    zip((py_, px_, cy_, cx_, c2_), in_batched)]
            return _kloop_call(*args, block_h=bh,
                               interpret=interpret), True

        # unpadded planes: _kloop_call pads rows itself
        return call(py, px, cy[0], cx[0], c2[0])

    n_blocks = -(-h // block_h)
    ph = n_blocks * block_h
    py = jnp.pad(py, ((0, ph - h), (0, 0)))
    px = jnp.pad(px, ((0, ph - h), (0, 0)))
    plane_spec = pl.BlockSpec((block_h, w), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            plane_spec,
            plane_spec,
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((ph, w), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(py, px, cy, cx, c2)
    return out[:h]
