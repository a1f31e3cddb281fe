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
                      interpret: bool = False,
                      planar: bool = False) -> jnp.ndarray:
    """x/y: [B, H, W, C] (or [B, C, H, W] when ``planar``) -> [B, H, W]."""
    if planar:
        bsz, c, h, w = x.shape
        pad = ((0, 0), (0, 0), (1, 1), (1, 1))
    else:
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
        if not planar:
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


# ---------------------------------------------------------------------------
# Fused backward kernel.
#
# The VJP of the residual w.r.t. (x, y) routes through five 3x3-pooled
# statistics. XLA autodiff materializes each pooled map AND its cotangent
# in HBM (~22 full-res passes per residual, BENCH_NOTES §SSIM round-3);
# this kernel recomputes the statistics from (x, y) inside VMEM and emits
# dx, dy in one pass: 3 reads (x, y, g) + 2 writes per element.
#
# Math (per channel, gc = g / C): with A = 2 mu_x mu_y + c1,
# B = 2 sigma_xy + c2, Cd = mu_x^2 + mu_y^2 + c1, D = sigma_x + sigma_y
# + c2, V = A B / (Cd D), the cotangents on the pooled maps are
#   gV     = -0.5 * ssim_w * gc * [0 < (1-V)/2 < 1]
#   gA     = gV * B / (Cd D),      gB = gV * A / (Cd D)
#   gC     = -gV * V / Cd,         gD = -gV * V / D
#   q_mu_x = 2 [ mu_y (gA - gB) + mu_x (gC - gD) ]
#   q_mu_y = 2 [ mu_x (gA - gB) + mu_y (gC - gD) ]
#   q_xx   = q_yy = gD,            q_xy = 2 gB
# and, with P^T the transpose of the 3x3 mean pool (a padded box sum / 9),
#   dx_pad = P^T(q_mu_x) + 2 x_pad P^T(q_xx) + y_pad P^T(q_xy) + dL1
#   dy_pad = P^T(q_mu_y) + 2 y_pad P^T(q_xx) + x_pad P^T(q_xy) - dL1
#   dL1    = (1 - ssim_w) gc sign(x_pad - y_pad)   (interior pixels)
# in REFLECT-PADDED coordinates; the caller folds the padded border rows
# and columns back onto their reflect sources (rows/cols 1 and H-2/W-2).
# ---------------------------------------------------------------------------


def _bwd_kernel(x_hbm, y_hbm, g_hbm, dx_hbm, dy_hbm, *, block_h: int,
                n_channels: int, ssim_w: float, c1: float, c2: float,
                w2p: int):
    """Grid cell (b, i) computes dx/dy for padded rows [i*bh, i*bh+bh).

    Column layout (Mosaic supports neither scatter-add nor mixed-layout
    concatenate, so every shift below is a STATIC SLICE of a wider
    buffer): all inputs share one buffer coordinate, buffer col cb =
    padded col pc + 2 = q col qc + 2, buffer width WB = w2p + 128. dx/dy
    outputs live at cols [0, w2p) in padded coordinates directly.

    Input arrays carry an 8-row top pad (so the halo'd loads stay
    sublane-aligned) and zero fill outside the real extents; q rows/cols
    with g == 0 contribute nothing, so junk statistics in the fill
    regions are harmless.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    bh = block_h
    wb = x_hbm.shape[3]  # w2p + 128
    nqw = wb - 2  # q-map buffer width

    def body(xs, ys, gs, dxs, dys, sems):
        row0 = pl.multiple_of(i * bh, 8)  # array row of padded row i*bh - 8

        for c in range(n_channels):  # static channel loop
            cp_x = pltpu.make_async_copy(
                x_hbm.at[b, c, pl.ds(row0, bh + 16)], xs, sems.at[0])
            cp_y = pltpu.make_async_copy(
                y_hbm.at[b, c, pl.ds(row0, bh + 16)], ys, sems.at[1])
            cp_x.start()
            cp_y.start()
            if c == 0:
                cp_g = pltpu.make_async_copy(
                    g_hbm.at[b, pl.ds(row0, bh + 16)], gs, sems.at[2])
                cp_g.start()
                cp_g.wait()
            cp_x.wait()
            cp_y.wait()

            x = xs[...]
            y = ys[...]
            # local q row j = global q row i*bh - 8 + j; we need q rows
            # [i*bh - 2, i*bh + bh) = local [6, bh + 8). Stats at q row j
            # pool padded rows [j, j+2] = local x rows [j, j+2]. In
            # columns, q buffer col cb pools x buffer cols [cb, cb+2]
            # (both offset +2 from their spaces, so offsets cancel).
            nq = bh + 2

            def pool3(v):
                pacc = None
                for dy in range(3):
                    for dx in range(3):
                        sl = v[6 + dy:6 + dy + nq, dx:dx + nqw]
                        pacc = sl if pacc is None else pacc + sl
                return pacc / 9.0

            mu_x = pool3(x)
            mu_y = pool3(y)
            pxx = pool3(x * x)
            pyy = pool3(y * y)
            pxy = pool3(x * y)

            mu_xx = mu_x * mu_x
            mu_yy = mu_y * mu_y
            mu_xy = mu_x * mu_y
            a = 2.0 * mu_xy + c1
            bb = 2.0 * (pxy - mu_xy) + c2
            cd = mu_xx + mu_yy + c1
            d = (pxx - mu_xx) + (pyy - mu_yy) + c2

            inv_cdd = 1.0 / (cd * d)
            v = a * bb * inv_cdd
            loss_half = (1.0 - v) * 0.5
            active = jnp.logical_and(loss_half > 0.0, loss_half < 1.0)

            gc = gs[6:6 + nq, 0:nqw] * (1.0 / n_channels)
            gv = jnp.where(active, -0.5 * ssim_w * gc, 0.0)
            ga = gv * bb * inv_cdd
            gb2 = gv * a * inv_cdd
            gcd = -(gv * v) / cd
            gd = -(gv * v) / d

            gab = ga - gb2
            gcdd = gcd - gd
            q_mu_x = 2.0 * (mu_y * gab + mu_x * gcdd)
            q_mu_y = 2.0 * (mu_x * gab + mu_y * gcdd)
            q_xx = gd
            q_xy = 2.0 * gb2

            def pool_t(q):
                """P^T: padded-space box sum /9 of the q-space cotangent.

                dx_pad row r (global i*bh + r) sums q rows [r-2, r] =
                local q rows [r, r+2]; dx_pad col pc sums q cols
                [pc-2, pc] = q buffer cols [pc, pc+2]."""
                rs = (q[0:bh] + q[1:bh + 1] + q[2:bh + 2]) / 9.0
                return rs[:, 0:w2p] + rs[:, 1:1 + w2p] + rs[:, 2:2 + w2p]

            t_mu_x = pool_t(q_mu_x)
            t_mu_y = pool_t(q_mu_y)
            t_xx = pool_t(q_xx)
            t_xy = pool_t(q_xy)

            # padded-space x/y at cols [0, w2p) = buffer cols [2, 2+w2p)
            xp = x[8:8 + bh, 2:2 + w2p]
            yp = y[8:8 + bh, 2:2 + w2p]
            # L1 term: output pixel (padded row r, padded col pc) reads
            # gc at q row r-1 (local g row r+7), q col pc-1 = buffer
            # col pc+1.
            sgn = jnp.sign(xp - yp)
            l1 = ((1.0 - ssim_w) / n_channels) * gs[7:7 + bh, 1:1 + w2p] * sgn

            dxs[...] = t_mu_x + 2.0 * xp * t_xx + yp * t_xy + l1
            dys[...] = t_mu_y + 2.0 * yp * t_xx + xp * t_xy - l1

            cp_dx = pltpu.make_async_copy(
                dxs, dx_hbm.at[b, c, pl.ds(row0, bh)], sems.at[3])
            cp_dy = pltpu.make_async_copy(
                dys, dy_hbm.at[b, c, pl.ds(row0, bh)], sems.at[4])
            cp_dx.start()
            cp_dy.start()
            cp_dx.wait()
            cp_dy.wait()

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((block_h + 16, wb), jnp.float32),
        ys=pltpu.VMEM((block_h + 16, wb), jnp.float32),
        gs=pltpu.VMEM((block_h + 16, wb), jnp.float32),
        dxs=pltpu.VMEM((block_h, w2p), jnp.float32),
        dys=pltpu.VMEM((block_h, w2p), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((5,)),
    )


def _bwd_batched(x: jnp.ndarray, y: jnp.ndarray, g: jnp.ndarray,
                 ssim_w: float, c1: float, c2: float,
                 interpret: bool = False, planar: bool = False):
    """dx, dy from x/y (layout matching ``planar``) and g [B, H, W, 1]."""
    if planar:
        bsz, c, h, w = x.shape
    else:
        bsz, h, w, c = x.shape
    hp = h + 2  # reflect-padded extent
    block_h = min(_BLOCK_H, -(-hp // 8) * 8)
    n_blocks = -(-hp // block_h)
    rows = n_blocks * block_h + 16  # 8 top pad + block coverage + halo
    w2p = -(-(w + 2) // 128) * 128  # output width, padded space
    wb = w2p + 128  # buffer width: data at col offset +2

    def prep(v):
        if planar:
            v = jnp.pad(v.astype(jnp.float32),
                        ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
        else:
            v = jnp.pad(v.astype(jnp.float32),
                        ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            v = jnp.transpose(v, (0, 3, 1, 2))  # [B, C, H+2, W+2]
        return jnp.pad(v, ((0, 0), (0, 0), (8, rows - 8 - hp),
                           (2, wb - 2 - (w + 2))))

    xp = prep(x)
    yp = prep(y)
    gp = jnp.pad(g[..., 0].astype(jnp.float32),
                 ((0, 0), (8, rows - 8 - h), (2, wb - 2 - w)))

    dxp, dyp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, block_h=block_h, n_channels=c, ssim_w=ssim_w,
            c1=c1, c2=c2, w2p=w2p,
        ),
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c, n_blocks * block_h, w2p),
                                 jnp.float32),
            jax.ShapeDtypeStruct((bsz, c, n_blocks * block_h, w2p),
                                 jnp.float32),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, yp, gp)

    def fold(dpad):
        # reflect-pad transpose: padded row/col -1 sourced from row/col 1,
        # padded row/col N from N-2 (torch-style reflect, edge excluded)
        dpad = dpad[:, :, :hp, :w + 2]
        dpad = dpad.at[:, :, 2].add(dpad[:, :, 0])
        dpad = dpad.at[:, :, h - 1].add(dpad[:, :, h + 1])
        dpad = dpad.at[:, :, :, 2].add(dpad[:, :, :, 0])
        dpad = dpad.at[:, :, :, w - 1].add(dpad[:, :, :, w + 1])
        core = dpad[:, :, 1:1 + h, 1:1 + w]
        return core if planar else jnp.transpose(core, (0, 2, 3, 1))

    return fold(dxp), fold(dyp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _residual_with_vjp(x, y, ssim_w, c1, c2, interpret, planar):
    return _residual_batched(x, y, ssim_w, c1, c2, interpret,
                             planar)[..., None]


def _residual_fwd(x, y, ssim_w, c1, c2, interpret, planar):
    return (_residual_with_vjp(x, y, ssim_w, c1, c2, interpret, planar),
            (x, y))


def _residual_bwd(ssim_w, c1, c2, interpret, planar, res, g):
    x, y = res
    return _bwd_batched(x, y, g, ssim_w, c1, c2, interpret, planar)


_residual_with_vjp.defvjp(_residual_fwd, _residual_bwd)


def fused_photometric_residual(warped: jnp.ndarray, image: jnp.ndarray,
                               ssim_weight: float = 0.85,
                               c1: float = 1e-4, c2: float = 9e-4,
                               use_pallas: bool | None = None,
                               interpret: bool = False,
                               planar: bool = False) -> jnp.ndarray:
    """Channel-mean 0.85*SSIM + 0.15*L1 residual -> [B, H, W, 1].

    Inputs are NHWC, or channel-planar [B, C, H, W] when ``planar`` —
    the loss keeps full-res tensors planar end-to-end so no relayout
    sits between the warp and SSIM kernels (round-5 glue cut; same
    kernel math either way, the layout only changes the host-side
    pad/transpose prep). Matches losses/photometric._photometric + ssim
    numerics exactly; differentiable (custom VJP with the fused
    backward kernel).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        if planar:
            b, c, h, w = warped.shape
            from mgnet_tpu.losses.photometric import _photometric_planar

            return _photometric_planar(
                warped.astype(jnp.float32).reshape(b * c, h, w),
                image.astype(jnp.float32).reshape(b * c, h, w),
                ssim_weight, b)[..., None]
        return _reference_residual(warped, image, ssim_weight)

    x = warped.astype(jnp.float32)
    y = image.astype(jnp.float32)
    return _residual_with_vjp(x, y, ssim_weight, c1, c2, interpret, planar)
