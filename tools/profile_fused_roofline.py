#!/usr/bin/env python
"""Per-stage roofline of the fused inference frame (VERDICT r4 next #3).

The whole-frame roofline (bench.py --roofline: 418.8 GFLOP, 5.34 GB,
12.7 ms -> MFU ~17%, HBM BW ~51%) says the frame is neither compute- nor
bandwidth-saturated; this tool attributes WHERE the non-saturated time
goes, with the same discipline as the train ledger
(tools/profile_train.py): telescoping structural ablation — variant i
removes one more pipeline stage than variant i-1, each ledger row is
T_{i-1} - T_i, so rows sum EXACTLY to the measured frame. For every row
the XLA cost-model deltas (flops, bytes accessed) give the stage's own
roofline floors: t_flops = dflops/peak, t_bw = dbytes/peak — a row
sitting far above max(t_flops, t_bw) is serialized overhead (relayouts,
VPU-bound Pallas work XLA doesn't count, dependency stalls).

Timing: chained-dependency protocol (bench.py), full-output sum probes.
"""

import argparse
import json
import os
import sys

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


def build_variants(height, width):
    """Return ordered {name: jittable step_fn(carry)->carry} variants,
    each removing one more trailing pipeline stage, plus the statics."""
    from functools import partial

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench as benchmod

    (cfg, model, params, batch_stats, statics, fused_raw,
     image, K, cam_h) = benchmod.build_pipeline(height, width)

    from mgnet_tpu.inference.fused import build_fused_inference
    from mgnet_tpu.train.step import normalize_images

    pm, ps = tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD)

    def probe(out_dict):
        return sum(jnp.nansum(v.astype(jnp.float32))
                   for v in out_dict.values())

    def step_of(fn):
        def step(carry):
            img = image + carry * jnp.float32(1e-24)
            return probe(fn(img))
        return step

    # V0: full pipeline (identical to bench.py full_step)
    v0 = step_of(lambda img: fused_raw(
        params, batch_stats, img, camera_matrix=K, camera_height=cam_h))

    # V1: no DGC (no reconstruct/normals/median/ground), no point cloud
    f_nodgc = build_fused_inference(
        model, statics._replace(use_dgc=False), pm, ps,
        return_point_cloud=False)
    v1 = step_of(lambda img: f_nodgc(
        params, batch_stats, img, camera_matrix=K, camera_height=cam_h))

    # V2: panoptic only (depth head/upsample/inv2depth/filters DCE'd)
    f_pan = build_fused_inference(
        model, statics._replace(use_dgc=False), pm, ps,
        with_depth=False, return_point_cloud=False)
    v2 = step_of(lambda img: f_pan(params, batch_stats, img))

    # V3: heads + upsample + argmax, NO panoptic fusion
    from mgnet_tpu.geometry.image import (
        interpolate_bilinear,
        interpolate_bilinear_cf,
    )

    def heads_upsampled(img):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        out = model.apply(variables, normalize_images(img, pm, ps),
                          train=False, upsample=False)
        stride = model.common_stride
        h8, w8 = out["sem_seg"].shape[1:3]
        out_hw = (h8 * stride, w8 * stride)
        sem_cf = interpolate_bilinear_cf(
            out["sem_seg"].transpose(0, 3, 1, 2).astype(jnp.float32),
            out_hw)
        return {
            "sem_seg": jnp.argmax(sem_cf, axis=1).astype(jnp.int32),
            "center": interpolate_bilinear(
                out["center"].astype(jnp.float32), out_hw)[..., 0],
            "offset": interpolate_bilinear(
                out["offset"].astype(jnp.float32), out_hw) * float(
                    model.common_stride),
        }

    v3 = step_of(heads_upsampled)

    # V4: model forward only, raw stride-8 head outputs (no upsample).
    # inv_depth stays EXCLUDED (the depth decoder was already removed at
    # V2 — re-adding it here would break the telescoping ledger).
    def heads_raw(img):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        out = model.apply(variables, normalize_images(img, pm, ps),
                          train=False, upsample=False)
        return {k: out[k] for k in ("sem_seg", "center", "offset")}

    v4 = step_of(heads_raw)

    return {
        "V0 full": v0,
        "V1 -DGC/points": v1,
        "V2 -depth branch": v2,
        "V3 -panoptic fusion": v3,
        "V4 -upsample/argmax (raw heads)": v4,
    }


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import bench as benchmod

    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    args = ap.parse_args()

    variants = build_variants(args.height, args.width)

    rows = []
    for name, step in variants.items():
        jitted = jax.jit(step)
        fl = by = 0.0
        try:
            ca = jitted.lower(jnp.float32(0.0)).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
        except Exception as e:
            print(f"# cost_analysis unavailable for {name}: {e}",
                  file=sys.stderr)
        t = benchmod.chained_seconds_per_iter(jitted, iters=args.iters)
        rows.append((name, t, fl, by))
        print(f"# {name}: {t * 1e3:.3f} ms, {fl / 1e9:.1f} GFLOP, "
              f"{by / 1e9:.2f} GB", file=sys.stderr, flush=True)

    peak_fl = args.peak_tflops * 1e12
    peak_by = args.peak_gbs * 1e9
    print("#", file=sys.stderr)
    print(f"# {'stage (telescoping delta)':34s} {'ms':>7s} {'GFLOP':>7s} "
          f"{'GB':>6s} {'t_fl':>6s} {'t_bw':>6s} {'xla-floor':>9s} "
          f"{'over':>5s}", file=sys.stderr)
    ledger = []
    for i, (name, t, fl, by) in enumerate(rows):
        if i + 1 < len(rows):
            nt, nfl, nby = rows[i + 1][1:]
        else:
            nt = nfl = nby = 0.0
        dt, dfl, dby = t - nt, fl - nfl, by - nby
        stage = (name if i + 1 == len(rows)
                 else f"{name} minus {rows[i + 1][0]}")
        t_fl, t_bw = dfl / peak_fl, dby / peak_by
        floor = max(t_fl, t_bw)
        over = (dt / floor) if floor > 0 else float("inf")
        ledger.append({"stage": stage, "ms": round(dt * 1e3, 3),
                       "gflop": round(dfl / 1e9, 1),
                       "gb": round(dby / 1e9, 3),
                       "floor_ms": round(floor * 1e3, 3),
                       "x_over_floor": round(over, 1)})
        print(f"# {stage[:34]:34s} {dt * 1e3:7.3f} {dfl / 1e9:7.1f} "
              f"{dby / 1e9:6.2f} {t_fl * 1e3:6.3f} {t_bw * 1e3:6.3f} "
              f"{floor * 1e3:9.3f} {over:5.1f}", file=sys.stderr)
    total = rows[0][1]
    print(f"# {'FULL FRAME (sum of rows)':34s} {total * 1e3:7.3f}",
          file=sys.stderr)
    print(json.dumps({"metric": "fused_frame_stage_roofline",
                      "full_ms": round(total * 1e3, 3),
                      "rows": ledger}))


if __name__ == "__main__":
    main()
