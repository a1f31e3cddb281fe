#!/usr/bin/env python
"""Training-step throughput benchmark (synthetic batch, real chip).

Reference context: 60k iters at global batch 12 (1024x1024 crops) on
4x RTX 2080Ti (configs/MGNet-Cityscapes-Fine.yaml). Here the full joint
train step (heads + pose net + all losses + Adam) is one compiled SPMD
program; this tool reports steady-state step time and images/sec.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--depth-only", action="store_true")
    p.add_argument("--no-depth", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-pallas-ssim", action="store_true",
                   help="force the XLA SSIM path")
    p.add_argument("--pallas-ssim", action="store_true",
                   help="enable the fused Pallas SSIM fwd+bwd kernels "
                        "(ops/pallas/ssim.py) in the photometric loss")
    p.add_argument("--accum", type=int, default=1,
                   help="SOLVER.GRAD_ACCUM_STEPS: --batch is the GLOBAL "
                        "batch, scanned as accum sequential micro-batches "
                        "in one jitted step (flagship batch-12 on one "
                        "chip: --batch 12 --accum 2)")
    args = p.parse_args()

    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.synthetic import synthetic_train_batch
    from mgnet_tpu.models.mgnet import build_model
    from mgnet_tpu.train import create_train_state, make_train_step

    cfg = get_default_config()
    cfg.MODEL.SEM_SEG_HEAD.OHEM_N_MIN = (args.size * args.size // 4) - 1
    if args.depth_only:
        cfg.WITH_PANOPTIC = False
    if args.no_depth:
        cfg.WITH_DEPTH = False
    if args.remat:
        cfg.MODEL.REMAT = True
    if args.accum > 1:
        cfg.SOLVER.GRAD_ACCUM_STEPS = args.accum
    if args.no_pallas_ssim:
        cfg.MODEL.DEPTH_HEAD.USE_PALLAS_SSIM = False
    elif args.pallas_ssim:
        cfg.MODEL.DEPTH_HEAD.USE_PALLAS_SSIM = True

    model = build_model(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        sample_shape=(args.batch, args.size, args.size, 3),
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    print(f"params: {n_params / 1e6:.1f} M")

    batch_np = synthetic_train_batch(
        args.batch, args.size, args.size,
        with_panoptic=cfg.WITH_PANOPTIC, with_depth=cfg.WITH_DEPTH,
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    # true D2H fetch: through the relay, block_until_ready acks
    # optimistically and the (slow, autotuned) first execution would
    # otherwise leak into the timed window
    float(metrics["loss_total"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s")

    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss_total"])

    # Chained protocol (see bench.py): steps serialize through the
    # donated `state`, so no intermediate blocking — one real D2H fetch
    # at the end proves the whole chain executed on device.
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    final_loss = float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"step time: {dt * 1000:.1f} ms  "
          f"({args.batch / dt:.2f} img/s, loss={final_loss:.3f})")


if __name__ == "__main__":
    main()
