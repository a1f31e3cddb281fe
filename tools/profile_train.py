#!/usr/bin/env python
"""Train-step stage ledger (VERDICT r2 #1): attribute the full measured
step time to stages, summing EXACTLY to the measured step.

Method: telescoping structural ablation. Variant i removes one more
stage than variant i-1 (surrogate warp -> L1-only residual -> no depth
branch -> plain-CE -> forward-only); each ledger row is T_{i-1} - T_i
and the last row is the final variant itself, so rows sum to the full
step by construction — no component microbenches that ignore fusion and
overlap. Every variant is timed with the chained-dependency protocol
(steps serialize through the donated train state; one real D2H fetch at
the end — see bench.py / BENCH_NOTES.md).

Reference context: the reference trains the same losses at interactive
step times on 2080Tis (configs/MGNet-Cityscapes-Fine.yaml:29-42); the
warp being attributed is camera_utils.view_synthesis
(reference mgnet/geometry/camera_utils.py:24-54).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

try:
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/mgnet_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def _surrogate_grid_sample(image, coords, padding_mode="zeros", *args):
    """Gather-free stand-in for grid_sample: same tensor shapes, keeps the
    full coordinate compute graph (and its gradients to depth/pose) but
    replaces the 4-corner gather with elementwise math."""
    blend = (coords[..., :1] + coords[..., 1:]) * 0.01
    return image * 0.999 + blend


def _l1_residual_planar(warped_p, image_p, ssim_w, batch):
    """SSIM-free residual with the real function's signature/shape."""
    d = jnp.abs(warped_p - image_p)
    h, w = d.shape[-2:]
    return d.reshape(batch, -1, h, w).mean(axis=1)


def build_step(cfg_overrides, patch_warp=False, patch_residual=False,
               forward_only=False, batch=8, size=1024):
    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.synthetic import synthetic_train_batch
    from mgnet_tpu.models.mgnet import build_model
    from mgnet_tpu.train import create_train_state, make_train_step
    import mgnet_tpu.geometry.camera_utils as cu
    import mgnet_tpu.losses.photometric as ph

    cfg = get_default_config()
    cfg.MODEL.SEM_SEG_HEAD.OHEM_N_MIN = (size * size // 4) - 1
    for k, v in cfg_overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], v)

    model = build_model(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0),
        sample_shape=(batch, size, size, 3),
    )
    batch_np = synthetic_train_batch(
        batch, size, size,
        with_panoptic=cfg.WITH_PANOPTIC, with_depth=cfg.WITH_DEPTH,
    )
    device_batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    saved = {}
    if patch_warp:
        saved["gs"] = cu.grid_sample
        cu.grid_sample = _surrogate_grid_sample
    if patch_residual:
        saved["res"] = ph._photometric_planar
        ph._photometric_planar = _l1_residual_planar
        cfg.MODEL.DEPTH_HEAD.USE_PALLAS_SSIM = False

    try:
        if forward_only:
            # forward-only: evaluate the loss without value_and_grad
            from mgnet_tpu.train.step import (
                apply_uncertainty,
                compute_losses,
                normalize_images,
            )

            pm, ps = tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD)

            def fwd(state_in, b):
                variables = {"params": state_in.params["model"],
                             "batch_stats": state_in.batch_stats}
                kwargs = {}
                if cfg.WITH_DEPTH:
                    kwargs = dict(
                        image_prev=normalize_images(b["image_prev"], pm, ps),
                        image_next=normalize_images(b["image_next"], pm, ps),
                    )
                outputs, _ = model.apply(
                    variables, normalize_images(b["image"], pm, ps),
                    method=type(model).forward_train,
                    mutable=["batch_stats"], **kwargs)
                losses = compute_losses(cfg, outputs, b)
                if cfg.WITH_UNCERTAINTY:
                    losses, _ = apply_uncertainty(
                        losses, state_in.params["log_vars"])
                total = sum(losses.values())
                # fold the loss back into a state leaf so consecutive
                # steps chain (same serialization as the real step)
                new_state = state_in.replace(
                    params={**state_in.params,
                            "log_vars": state_in.params["log_vars"]
                            + 0.0 * total})
                return new_state, {"loss_total": total}

            step = jax.jit(fwd, donate_argnums=(0,))
        else:
            step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
        return step, state, device_batch, saved, (cu, ph)
    except Exception:
        _unpatch(saved, cu, ph)
        raise


def _unpatch(saved, cu, ph):
    if "gs" in saved:
        cu.grid_sample = saved["gs"]
    if "res" in saved:
        ph._photometric_planar = saved["res"]


def time_variant(name, iters=8, warmup=2, batch=8, size=1024,
                 costs_out=None, **kw):
    step, state, device_batch, saved, (cu, ph) = build_step(
        batch=batch, size=size, **kw)
    try:
        if costs_out is not None:
            # XLA's own cost model for the same executable we time:
            # algebraic FLOPs + estimated HBM bytes accessed. Lowering
            # is cheap; compilation hits the persistent cache.
            try:
                ca = step.lower(state, device_batch).compile().cost_analysis()
                if isinstance(ca, list):  # older jax returns [dict]
                    ca = ca[0]
                costs_out[name] = {
                    "flops": float(ca.get("flops", 0.0)),
                    "bytes": float(ca.get("bytes accessed", 0.0)),
                }
            except Exception as e:  # pragma: no cover - backend-specific
                print(f"# cost_analysis unavailable for {name}: {e}",
                      file=sys.stderr)
                costs_out[name] = {"flops": 0.0, "bytes": 0.0}
        t0 = time.perf_counter()
        state, metrics = step(state, device_batch)
        float(metrics["loss_total"])  # true sync: D2H through the relay
        compile_s = time.perf_counter() - t0
        for _ in range(warmup):
            state, metrics = step(state, device_batch)
        float(metrics["loss_total"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, device_batch)
        final = float(metrics["loss_total"])
        dt = (time.perf_counter() - t0) / iters
        assert final == final, "non-finite loss in profile variant"
        mem = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            mem = stats.get("peak_bytes_in_use")
        except Exception:
            pass
        print(f"# {name}: {dt:.3f} s/step (compile {compile_s:.0f} s, "
              f"peak {mem / 2**30 if mem else -1:.1f} GiB)",
              flush=True, file=sys.stderr)
        return dt
    finally:
        _unpatch(saved, cu, ph)


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--roofline", action="store_true",
                   help="add XLA cost_analysis FLOPs/bytes per telescoping "
                        "row and report MFU + HBM-BW utilization against "
                        "v5e peaks (VERDICT r3 #4)")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="accelerator peak (v5e bf16 = 197 TFLOP/s)")
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="HBM bandwidth peak (v5e = 819 GB/s)")
    args = p.parse_args()
    b, s = args.batch, args.size
    costs = {} if args.roofline else None

    t_full = time_variant(
        "T0 full step", args.iters, batch=b, size=s, cfg_overrides={},
        costs_out=costs)
    t_nowarp = time_variant(
        "T1 surrogate warp", args.iters, batch=b, size=s, cfg_overrides={},
        patch_warp=True, costs_out=costs)
    t_l1 = time_variant(
        "T2 + L1-only residual", args.iters, batch=b, size=s,
        cfg_overrides={}, patch_warp=True, patch_residual=True,
        costs_out=costs)
    t_nodepth = time_variant(
        "T3 no depth branch", args.iters, batch=b, size=s,
        cfg_overrides={"WITH_DEPTH": False}, costs_out=costs)
    t_ce = time_variant(
        "T4 + plain CE", args.iters, batch=b, size=s,
        cfg_overrides={"WITH_DEPTH": False,
                       "MODEL.SEM_SEG_HEAD.LOSS_TYPE": "cross_entropy"},
        costs_out=costs)
    t_fwd = time_variant(
        "T5 forward-only", args.iters, batch=b, size=s,
        cfg_overrides={"WITH_DEPTH": False,
                       "MODEL.SEM_SEG_HEAD.LOSS_TYPE": "cross_entropy"},
        forward_only=True, costs_out=costs)

    times = [t_full, t_nowarp, t_l1, t_nodepth, t_ce, t_fwd]
    names = [
        "warp_gathers_6x_fwd_bwd",
        "ssim_residuals_8x_fwd_bwd",
        "depth_branch_rest (pose+decoder+3 upsamples+smoothness+reduce+L1)",
        "ohem_overhead",
        "panoptic_backward_plus_optimizer",
        "panoptic_forward (backbone+GCM+2 decoders+CE fwd)",
    ]
    ledger = {}
    for i, name in enumerate(names):
        nxt = times[i + 1] if i + 1 < len(times) else 0.0
        ledger[name] = times[i] - nxt
    out = {
        "batch": b, "size": s,
        "full_step_s": round(t_full, 4),
        "ledger_s": {k: round(v, 4) for k, v in ledger.items()},
        "ledger_sum_s": round(sum(ledger.values()), 4),
    }

    if args.roofline:
        # Telescoping FLOPs/bytes: row i = cost(variant i) - cost(i+1),
        # the same construction as the time ledger, so rows sum to the
        # full step's totals. Pallas kernels opt out of XLA's FLOP count
        # (their cost shows in rows as a DECREASE vs the surrogate) —
        # per-row numbers are the XLA-visible compute only; the full-step
        # MFU row is the honest headline.
        labels = ["T0 full step", "T1 surrogate warp",
                  "T2 + L1-only residual", "T3 no depth branch",
                  "T4 + plain CE", "T5 forward-only"]
        peak_f = args.peak_tflops * 1e12
        peak_b = args.peak_gbs * 1e9
        roof = {}
        for i, name in enumerate(names):
            c0 = costs[labels[i]]
            c1 = (costs[labels[i + 1]] if i + 1 < len(labels)
                  else {"flops": 0.0, "bytes": 0.0})
            dt = max(ledger[name], 1e-9)
            fl = c0["flops"] - c1["flops"]
            by = c0["bytes"] - c1["bytes"]
            roof[name] = {
                "gflops": round(fl / 1e9, 1),
                "gbytes": round(by / 1e9, 2),
                "mfu_pct": round(100 * fl / dt / peak_f, 2),
                "hbm_bw_pct": round(100 * by / dt / peak_b, 1),
            }
        c_full = costs["T0 full step"]
        roof["FULL STEP"] = {
            "gflops": round(c_full["flops"] / 1e9, 1),
            "gbytes": round(c_full["bytes"] / 1e9, 2),
            "mfu_pct": round(100 * c_full["flops"] / t_full / peak_f, 2),
            "hbm_bw_pct": round(100 * c_full["bytes"] / t_full / peak_b, 1),
        }
        out["roofline"] = roof
        out["peaks"] = {"tflops_bf16": args.peak_tflops,
                        "hbm_gbs": args.peak_gbs}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
