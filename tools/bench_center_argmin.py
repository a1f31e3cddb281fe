#!/usr/bin/env python
"""A/B bench: center_argmin kernel variants at the production shape.

Round-5 attack on the fused-frame roofline's biggest row (panoptic
fusion, 6.3 ms at 12.5x its XLA floor — tools/profile_fused_roofline.py);
the Pallas argmin is its largest sub-stage. Variants:

  xla        — chunked lax.map formulation (postprocessing/panoptic.py)
  broadcast  — [block_h, W, K] VMEM score tensor, lane-K argmin (r2 kernel)
  kloop:N    — scalar-K loop, running (min, argmin) on [N, W] vregs

Measured (1024x2048, K=128, chained, one v5e chip, 2026-08-19):
broadcast 3.68 ms / kloop:8 1.51 ms / kloop:64 3.53 ms / kloop:128
2.87 ms / xla_chunked 4.85 ms → kloop:8 is the production default.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from mgnet_tpu.ops.pallas.center_argmin import center_argmin
    from mgnet_tpu.postprocessing.panoptic import _cluster_pixels
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from profile_postproc import chained

    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=1024)
    p.add_argument("--w", type=int, default=2048)
    p.add_argument("--k", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    h, w, k = args.h, args.w, args.k

    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        np.stack(np.mgrid[0:h, 0:w], -1) + rng.randn(h, w, 2) * 10,
        jnp.float32)
    centers = jnp.asarray(rng.uniform(0, max(h, w), (k, 2)), jnp.float32)
    valid = jnp.asarray(rng.rand(k) > 0.3)

    ref = None
    rows = []

    def probe_of(fn):
        @jax.jit
        def s(c):
            out = fn(pts + c * 1e-24)
            return out.reshape(-1)[0].astype(jnp.float32) + jnp.float32(
                jnp.sum(out == out[0, 0]))
        return s

    variants = {
        "broadcast": lambda p_: center_argmin(
            p_, centers, valid, variant="broadcast"),
        "kloop:8": lambda p_: center_argmin(
            p_, centers, valid, variant="kloop", block_h=8),
        "kloop:64": lambda p_: center_argmin(
            p_, centers, valid, variant="kloop", block_h=64),
        "kloop:128": lambda p_: center_argmin(
            p_, centers, valid, variant="kloop", block_h=128),
    }
    for name, fn in variants.items():
        out = np.asarray(jax.jit(fn)(pts))
        if ref is None:
            big = np.where(np.asarray(valid)[:, None],
                           np.asarray(centers), 1e12)
            d = -2 * np.asarray(pts) @ big.T + (big ** 2).sum(-1)
            ref = d.argmin(-1)
        mismatch = int((out != ref).sum())
        t = chained(probe_of(fn), args.iters)
        rows.append((name, t, mismatch))
        print(f"{name:12s} {t * 1e3:7.3f} ms  mismatches={mismatch}",
              flush=True)

    # XLA chunked path for scale (argmin only, same probe)
    thing = jnp.ones((h, w), bool)
    off = pts - jnp.asarray(
        np.stack(np.mgrid[0:h, 0:w], -1), jnp.float32)

    @jax.jit
    def s_xla(c):
        a = _cluster_pixels(centers, valid, off + c * 1e-24, thing,
                            use_pallas=False)
        return a.reshape(-1)[0].astype(jnp.float32)

    print(f"{'xla_chunked':12s} {chained(s_xla, args.iters) * 1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
