"""Pallas TPU kernel: fused SSIM+L1 photometric residual.

The photometric loss (SURVEY.md north star: the designated fused kernel)
evaluates, per candidate warped image, the channel-mean of
``0.85 * SSIM_loss + 0.15 * |warped - image|`` where SSIM uses 3x3
average-pool statistics with reflect padding (reference:
mgnet/modeling/loss.py:187-220).

The XLA version materializes five 3x3-pooled HxW maps per candidate in
HBM. This kernel streams overlapping row-blocks (2-row halo) of each
channel plane from HBM into VMEM with explicit async DMA, computes all
nine window statistics and the blended residual on the VPU, and
accumulates the channel mean directly into the [H, W] output block —
cutting HBM traffic for the SSIM stage several-fold.

Layout note: channel-last [.., 3] tiles violate the TPU lane tiling
(last dim must align to 128), so the input is transposed to channel
planes [B, C, H, W] and the channel dimension rides the innermost grid
axis with output revisiting.

Falls back to the jnp implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_photometric_residual"]

_BLOCK_H = 128


def _kernel(x_hbm, y_hbm, out_ref, *, block_h: int, n_channels: int,
            ssim_w: float, c1: float, c2: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    w2p = x_hbm.shape[3]
    out_h = block_h
    out_w = out_ref.shape[2]

    def body(xs, ys, os, sems):
        # copy size must be sublane (8) aligned: use an 8-row halo
        row0 = pl.multiple_of(i * block_h, 8)

        acc = None
        for c in range(n_channels):  # static channel loop
            cp_x = pltpu.make_async_copy(
                x_hbm.at[b, c, pl.ds(row0, block_h + 8)], xs, sems.at[0]
            )
            cp_y = pltpu.make_async_copy(
                y_hbm.at[b, c, pl.ds(row0, block_h + 8)], ys, sems.at[1]
            )
            cp_x.start()
            cp_y.start()
            cp_x.wait()
            cp_y.wait()

            x = xs[...]
            y = ys[...]

            def pool3(v):
                pacc = None
                for dy in range(3):
                    for dx in range(3):
                        sl = v[dy:dy + out_h, dx:dx + out_w]
                        pacc = sl if pacc is None else pacc + sl
                return pacc / 9.0

            mu_x = pool3(x)
            mu_y = pool3(y)
            mu_xx = mu_x * mu_x
            mu_yy = mu_y * mu_y
            mu_xy = mu_x * mu_y
            sigma_x = pool3(x * x) - mu_xx
            sigma_y = pool3(y * y) - mu_yy
            sigma_xy = pool3(x * y) - mu_xy

            ssim_val = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
                (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
            )
            ssim_loss = jnp.clip((1.0 - ssim_val) * 0.5, 0.0, 1.0)

            l1 = jnp.abs(x[1:1 + out_h, 1:1 + out_w]
                         - y[1:1 + out_h, 1:1 + out_w])
            blended = (ssim_w * ssim_loss + (1.0 - ssim_w) * l1) / n_channels
            acc = blended if acc is None else acc + blended

        os[...] = acc
        row0_out = pl.multiple_of(i * block_h, 8)
        cp_out = pltpu.make_async_copy(
            os, out_ref.at[b, pl.ds(row0_out, block_h)], sems.at[2]
        )
        cp_out.start()
        cp_out.wait()

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((block_h + 8, w2p), jnp.float32),
        ys=pltpu.VMEM((block_h + 8, w2p), jnp.float32),
        os=pltpu.VMEM((block_h, out_ref.shape[2]), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((3,)),
    )


def _residual_batched(x: jnp.ndarray, y: jnp.ndarray, ssim_w: float,
                      c1: float, c2: float,
                      interpret: bool = False) -> jnp.ndarray:
    """x/y: [B, H, W, C] -> [B, H, W] residual."""
    bsz, h, w, c = x.shape
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    xp = jnp.pad(x.astype(jnp.float32), pad, mode="reflect")
    yp = jnp.pad(y.astype(jnp.float32), pad, mode="reflect")

    # block height: sublane (8) aligned so the halo'd async copies stay
    # aligned for any input height
    block_h = min(_BLOCK_H, max(8, -(-h // 8) * 8))
    n_blocks = -(-h // block_h)
    ph = n_blocks * block_h + 8
    # lane-align (128) the OUTPUT width as well — a narrower HBM output
    # block fails Mosaic memref slicing (observed at w=64); the input
    # needs 2 extra halo columns beyond the padded output width.
    w_out = -(-w // 128) * 128
    w2p = -(-(w_out + 2) // 128) * 128

    def prep(v):
        v = jnp.transpose(v, (0, 3, 1, 2))  # [B, C, H+2, W+2]
        return jnp.pad(v, ((0, 0), (0, 0), (0, ph - v.shape[2]),
                           (0, w2p - v.shape[3])))

    xp = prep(xp)
    yp = prep(yp)

    out = pl.pallas_call(
        functools.partial(
            _kernel, block_h=block_h, n_channels=c, ssim_w=ssim_w,
            c1=c1, c2=c2,
        ),
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_blocks * block_h, w_out), jnp.float32
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, yp)
    return out[:, :h, :w]


def _reference_residual(x, y, ssim_weight):
    from mgnet_tpu.losses.photometric import _photometric

    return _photometric(x, y, ssim_weight)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _residual_with_vjp(x, y, ssim_w, c1, c2, interpret):
    return _residual_batched(x, y, ssim_w, c1, c2, interpret)[..., None]


def _residual_fwd(x, y, ssim_w, c1, c2, interpret):
    return _residual_with_vjp(x, y, ssim_w, c1, c2, interpret), (x, y)


def _residual_bwd(ssim_w, c1, c2, interpret, res, g):
    # Backward via the XLA reference formulation (identical numerics);
    # the Pallas forward saves the HBM traffic on the hot fwd path.
    x, y = res
    _, vjp = jax.vjp(lambda a, b: _reference_residual(a, b, ssim_w), x, y)
    return vjp(g)


_residual_with_vjp.defvjp(_residual_fwd, _residual_bwd)


def fused_photometric_residual(warped: jnp.ndarray, image: jnp.ndarray,
                               ssim_weight: float = 0.85,
                               c1: float = 1e-4, c2: float = 9e-4,
                               use_pallas: bool | None = None,
                               interpret: bool = False) -> jnp.ndarray:
    """Channel-mean 0.85*SSIM + 0.15*L1 residual, NHWC -> [B, H, W, 1].

    Matches losses/photometric._photometric + ssim numerics exactly;
    differentiable (custom VJP: fused forward, XLA-reference backward).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _reference_residual(warped, image, ssim_weight)

    x = warped.astype(jnp.float32)
    y = image.astype(jnp.float32)
    return _residual_with_vjp(x, y, ssim_weight, c1, c2, interpret)
