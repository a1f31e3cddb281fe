#!/usr/bin/env python
"""Export the fused inference pipeline to a serialized AOT artifact.

Parity with reference: tools/onnx_trt_export.py — but one artifact holds
the whole pipeline (model + postprocessing + DGC), weights baked in.

Usage:
  python tools/export_inference.py --config-file configs/MGNet-Cityscapes-Fine.yaml \
      --weights <ckpt> --output model.jaxir --height 1024 --width 2048
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from mgnet_tpu.config import load_config
    from mgnet_tpu.data.catalog import Metadata
    from mgnet_tpu.data.categories import (
        CITYSCAPES_SCENE_SEG_CATEGORIES,
        build_meta,
    )
    from mgnet_tpu.export import export_fused_inference, save_exported
    from mgnet_tpu.inference.fused import (
        build_fused_inference,
        statics_from_meta,
    )
    from mgnet_tpu.models.mgnet import build_model

    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--weights", default="")
    p.add_argument("--output", required=True)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--verify", action="store_true",
                   help="after export: reload the artifact and assert "
                        "numeric parity with the live jit on the current "
                        "backend (reference onnx.checker role, "
                        "tools/onnx_trt_export.py:112-113)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = load_config(args.config_file, args.opts)
    model = build_model(cfg)
    weights = args.weights or cfg.MODEL.WEIGHTS
    if weights and not os.path.exists(weights) \
            and not os.path.exists(weights + ".npz"):
        print(f"WARNING: weights path {weights} not found; using random init")
        weights = ""

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)), train=False
    )
    params = {"model": variables["params"]}
    batch_stats = variables.get("batch_stats", {})
    if weights:
        npz = weights if weights.endswith(".npz") else weights + ".npz"
        if os.path.exists(npz):
            # ImageNet-init graft file (cfg.MODEL.WEIGHTS), not a trained
            # checkpoint: graft onto fresh init like Trainer.resume_or_load
            from mgnet_tpu.utils.weights import load_pretrained_npz

            params, batch_stats, info = load_pretrained_npz(
                npz, params, batch_stats)
            print(f"Grafted {info['matched']} leaves from {npz}")
        else:
            # trained checkpoint dir (Trainer model_final)
            from mgnet_tpu.utils.checkpoint import load_params

            params, batch_stats = load_params(weights)
    else:
        print("WARNING: exporting with random weights (no checkpoint given)")

    meta = Metadata(name="export").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
    )
    fused = build_fused_inference(
        model, statics_from_meta(cfg, meta),
        tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD),
        with_panoptic=cfg.WITH_PANOPTIC, with_depth=cfg.WITH_DEPTH,
    )
    exported, blob = export_fused_inference(
        fused, params, batch_stats,
        input_shape=(1, args.height, args.width, 3),
    )
    save_exported(args.output, blob)
    # also dump the StableHLO module + compile options for the C++ PJRT
    # runtime (native/src/pjrt_runner.cpp)
    mlir_path = args.output + ".stablehlo"
    with open(mlir_path, "wb") as f:
        f.write(exported.mlir_module_serialized)
    from jaxlib.xla_client import CompileOptions

    co = CompileOptions()
    co.num_replicas = 1
    co.num_partitions = 1
    with open(args.output + ".compile_options.pb", "wb") as f:
        f.write(co.SerializeAsString())
    print(f"Wrote {args.output} ({len(blob)} bytes), {mlir_path}, "
          f"{args.output}.compile_options.pb")

    if args.verify:
        import numpy as np

        from mgnet_tpu.export import load_exported

        call = load_exported(args.output)
        rng = np.random.RandomState(0)
        img = jnp.asarray(
            rng.randint(0, 255, (1, args.height, args.width, 3)),
            jnp.float32)
        K = jnp.asarray(np.array(
            [[[2262.52, 0, (args.width - 1) / 2],
              [0, 2265.3, (args.height - 1) / 2],
              [0, 0, 1]]], np.float32))
        ch = jnp.asarray([1.22], jnp.float32)
        out = jax.device_get(call(img, K, ch))
        live = jax.device_get(jax.jit(
            lambda i, k, c: fused(params, batch_stats, i,
                                  camera_matrix=k, camera_height=c)
        )(img, K, ch))
        assert set(out) == set(live), (set(out), set(live))
        np.testing.assert_array_equal(out["panoptic"], live["panoptic"])
        np.testing.assert_array_equal(out["sem_seg"], live["sem_seg"])
        np.testing.assert_allclose(out["depth"], live["depth"],
                                   rtol=1e-4, atol=1e-4)
        print(f"PARITY OK on {jax.default_backend()}: exported artifact "
              "matches live jit (panoptic/sem exact, depth 1e-4)")


if __name__ == "__main__":
    main()
