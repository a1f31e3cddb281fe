#!/usr/bin/env python
"""Self-supervised depth overfit validation.

Constructs a synthetic 3-frame sequence with pure horizontal parallax and
two depth layers: the top half of a textured image shifts by 2 px between
frames, the bottom half by 6 px. A translating camera observing two
fronto-parallel planes produces exactly this, with the planes' depths in
ratio 3:1. The photometric loss + pose net must recover that relative
structure (absolute scale is unobservable — the evaluator's GT-median
scaling handles it, as for any monocular self-supervised method).

Passes when Abs Rel < 0.15 against the analytic two-plane ground truth.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 128, 256
FX = 226.0
BASELINE = 0.22
DEPTH_TOP, DEPTH_BOTTOM = 30.0, 10.0  # ratio 3:1 == shift ratio 3:9
# --mode full scene: four planes, shift_i = FX*tx/d_i, FX*tx = 90
PLANE_SHIFTS = (2, 3, 6, 9)
PLANE_DEPTHS = (45.0, 30.0, 15.0, 10.0)
N_SCENES = 6


def _texture(seed: int = 7, width: int = W):
    """Multi-octave random texture, [0,1] floats.

    Root-cause finding (VERDICT r1 #7): single-octave blurred white noise
    (sigma 1.2 => ~3 px correlation length) gives the photometric loss NO
    gradient basin at the scene's 9 px parallax — the r1 probe failure was
    a property of the probe texture, not of the loss (the 1-D landscape
    over tx with coarse structure is smooth and minimized exactly at the
    analytic pose; see docs/depth_validation.md). Natural images have
    coarse structure; octaves at sigma 6 and 24 restore it here.
    """
    import cv2

    rng = np.random.RandomState(seed)
    tex = np.zeros((H, width + 32, 3), np.float32)
    for sigma, weight in [(1.5, 0.45), (6.0, 0.3), (24.0, 0.25)]:
        n = cv2.GaussianBlur(
            rng.rand(H, width + 32, 3).astype(np.float32), (0, 0), sigma)
        n = (n - n.mean()) / (n.std() + 1e-6)
        tex += weight * n
    return (tex - tex.min()) / (np.ptp(tex) + 1e-6)


def make_dataset(root: str, width: int = W):
    from PIL import Image

    from mgnet_tpu.data.mapper import id2rgb

    city = "depthfit"
    rng = np.random.RandomState(7)
    dirs = {
        "img": f"{root}/cityscapes/leftImg8bit/train/{city}",
        "seq": f"{root}/cityscapes/leftImg8bit_sequence/train/{city}",
        "cam": f"{root}/cityscapes/camera/train/{city}",
        "disp": f"{root}/cityscapes/disparity/train/{city}",
        "gt": f"{root}/cityscapes/gtFine/cityscapes_panoptic_train",
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    # SIX scenes with distinct textures over the same analytic
    # geometry: scene diversity is what makes self-supervised SfM
    # well-posed — it decouples pose from the per-scene appearance,
    # keeps batch statistics representative (BN eval/train agreement),
    # and is exactly what the single-scene probe lacked.
    # FOUR fronto-parallel planes, one camera translation: shift_i =
    # fx*tx/d_i with fx*tx = 90 -> integer parallaxes (2, 3, 6, 9) px at
    # depths (45, 30, 15, 10) m. Two planes are NOT enough: the min-
    # reduction over the two context frames lets a FLAT depth field
    # reach the loss plateau (prev's uniform warp fits one plane, next's
    # the other — observed: photometric 0.021 with collapsed depth).
    # With four layers no pair of uniform shifts covers the scene, so
    # the plateau requires the true layered structure — the same reason
    # min-reduce works on real many-depth scenes.
    def band(i):
        lo = i * H // 4
        return slice(lo, lo + H // 4)

    # disparity GT encoding the four analytic plane depths
    depth_gt = np.empty((H, width), np.float32)
    for i, d in enumerate(PLANE_DEPTHS):
        depth_gt[band(i)] = d
    disp = BASELINE * FX / depth_gt
    stored = (disp * 256.0 + 1.0).astype(np.uint16)

    anns = []
    for sc in range(N_SCENES):
        tex = (_texture(seed=7 + sc, width=width) * 255).astype(np.uint8)

        def frame(shift_sign):
            img = np.empty((H, width, 3), np.uint8)
            for i, sh in enumerate(PLANE_SHIFTS):
                img[band(i)] = np.roll(
                    tex[band(i)], sh * shift_sign, axis=1)[:, :width]
            return img

        stem = f"{city}_{sc:06d}_000010"
        Image.fromarray(frame(0)).save(
            f"{dirs['img']}/{stem}_leftImg8bit.png")
        for i, sign in ((9, 1), (10, 0), (11, -1)):
            Image.fromarray(frame(sign)).save(
                f"{dirs['seq']}/{city}_{sc:06d}_{i:06d}_leftImg8bit.png")

        # panoptic gt (unused for depth; keeps the mapper uniform)
        pan = np.full((H, width), 1 * 1000, np.int32)
        Image.fromarray(id2rgb(pan)).save(
            f"{dirs['gt']}/{stem}_gtFine_panoptic.png")
        anns.append({
            "image_id": stem,
            "file_name": f"{stem}_gtFine_panoptic.png",
            "segments_info": [
                {"id": 1000, "category_id": 7, "iscrowd": 0}],
        })
        with open(f"{dirs['cam']}/{stem}_camera.json", "w") as f:
            json.dump({"intrinsic": {"fx": FX, "fy": FX,
                                     "u0": (width - 1) / 2,
                                     "v0": (H - 1) / 2},
                       "extrinsic": {"baseline": BASELINE, "z": 1.2}},
                      f)
        Image.fromarray(stored).save(
            f"{dirs['disp']}/{stem}_disparity.png")

    with open(f"{root}/cityscapes/gtFine/cityscapes_panoptic_train.json",
              "w") as f:
        json.dump({"annotations": anns, "categories": []}, f)


def _analytic_frames(width: int = W):
    """In-memory version of the synthetic two-plane scene, [0,1] floats."""
    tex = _texture(width=width)

    def frame(sign):
        img = np.empty((H, width, 3), np.float32)
        img[: H // 2] = np.roll(
            tex[: H // 2], 3 * sign, axis=1)[:, :width]
        img[H // 2:] = np.roll(
            tex[H // 2:], 9 * sign, axis=1)[:, :width]
        return img

    cur, prev, nxt = frame(0), frame(1), frame(-1)
    K = np.array([[FX, 0, (width - 1) / 2], [0, FX, (H - 1) / 2],
                  [0, 0, 1]], np.float32)[None]
    # pixel shift s at depth d <=> tx = s * d / fx; by construction both
    # planes give the same camera translation (3*30 == 9*10). FX and the
    # per-plane pixel shifts are width-independent, so no rescaling is
    # needed when width changes — only the principal point moves.
    tx = 3.0 * DEPTH_TOP / FX
    inv_gt = np.full((1, H, width, 1), 1.0 / DEPTH_TOP, np.float32)
    inv_gt[:, H // 2:] = 1.0 / DEPTH_BOTTOM
    return cur[None], prev[None], nxt[None], K, tx, inv_gt


def run_ablation(mode: str, steps: int,
                 pallas_warp: str = "off", width: int = W) -> int:
    """Isolated optimization probes (VERDICT r1 #7 root-cause ablations).

    gt_pose:  optimize a per-pixel inverse-depth field with the analytic
              pose fixed — validates that the warp + photometric loss
              *optimization landscape* (not just the forward model,
              tests/test_warp_analytic.py) leads to the true structure.
              Success metric: per-plane MEDIAN depth (pixels without
              local texture gradient are unconstrained by photometric
              consistency — the aperture problem — and only weakly tied
              by the smoothness prior, so a mean is not meaningful).
    gt_depth: optimize the pose translation with the true depth fixed.
              Rotation is frozen: on a single static sample, yaw mimics
              uniform image shift with fx-amplified leverage and drags
              Adam into a rotation-dominated local minimum (documented in
              docs/depth_validation.md — real training avoids this via
              small LR, the 0.01 PoseCNN output scaling, and batch
              diversity). Reduce op is 'mean': with 'min', the first
              context frame to align wins every pixel's min-reduction and
              starves the other frame's gradient — a single-static-scene
              artifact, not a training-path bug.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from mgnet_tpu.losses.photometric import multi_view_photometric_loss

    cur, prev, nxt, K, tx, inv_gt = map(
        jnp.asarray, _analytic_frames(width=width))
    gt_pose = jnp.asarray(
        [[[tx, 0, 0, 0, 0, 0], [-tx, 0, 0, 0, 0, 0]]], jnp.float32
    )

    use_pallas = {"off": False, "exact": True,
                  "fast": "fast"}[pallas_warp]

    def photo(inv_depth, poses, reduce_op="min"):
        out = multi_view_photometric_loss(
            [inv_depth], poses, K, cur, [prev, nxt],
            automask_loss=False, smoothing_loss_weight=0.001,
            photometric_reduce_op=reduce_op,
            use_pallas_warp=use_pallas,
        )
        return (out["loss_photometric"] + out["loss_smoothness"],
                out["loss_photometric"])

    truth_photo = float(photo(inv_gt, gt_pose)[1])
    print(f"photometric at analytic truth: {truth_photo:.6f}")

    if mode == "gt_pose":
        # head-equivalent parameterization inv = sigmoid(p)/0.5, init
        # near 15 m (between the 10/30 m planes)
        param = jnp.full((1, H, width, 1), -3.4, jnp.float32)
        loss_fn = lambda p: photo(jax.nn.sigmoid(p) / 0.5, gt_pose)  # noqa: E731
        lr = 3e-2
    elif mode == "gt_depth":
        param = jnp.zeros((1, 2, 3), jnp.float32)  # translations only

        def loss_fn(p):
            poses = 0.01 * jnp.concatenate(
                [p, jnp.zeros((1, 2, 3), jnp.float32)], axis=-1)
            return photo(inv_gt, poses, reduce_op="mean")

        lr = 3e-2
    else:
        raise ValueError(mode)

    tx_opt = optax.adam(lr)
    opt_state = tx_opt.init(param)

    @jax.jit
    def step(param, opt_state):
        (total, photo_l), g = jax.value_and_grad(
            loss_fn, has_aux=True)(param)
        updates, opt_state = tx_opt.update(g, opt_state, param)
        return optax.apply_updates(param, updates), opt_state, photo_l

    for i in range(steps):
        param, opt_state, photo_l = step(param, opt_state)
        if i % max(1, steps // 8) == 0 or i == steps - 1:
            print(f"  step {i:5d}  photometric {float(photo_l):.6f}")

    photo_l = float(photo_l)
    if mode == "gt_pose":
        inv = np.asarray(jax.nn.sigmoid(param) / 0.5)[0, ..., 0]
        depth = 1.0 / np.clip(inv, 1e-6, None)
        # per-plane medians away from borders (warp zero padding) and
        # the depth-discontinuity seam
        top = float(np.median(depth[16: H // 2 - 4, 16:-16]))
        bot = float(np.median(depth[H // 2 + 4: -16, 16:-16]))
        print(f"gt_pose: photometric {photo_l:.6f}  "
              f"median depth top {top:.2f} (gt {DEPTH_TOP})  "
              f"bottom {bot:.2f} (gt {DEPTH_BOTTOM})")
        # Loss bound: the converged field plateaus at the aperture-problem
        # floor (~0.03: texture-gradient-free pixels drift), NOT at
        # truth_photo. truth_photo itself dropped 0.0139 -> 1e-6 when the
        # warp went planar-f32 (the packed einsum chain computed sampling
        # coordinates through default-precision MXU matmuls — a real
        # subpixel-jitter bug), so a truth-relative bound is now far
        # below the plateau. The medians are the robust statistic.
        ok = (photo_l < 0.05
              and abs(top - DEPTH_TOP) < 0.15 * DEPTH_TOP
              and abs(bot - DEPTH_BOTTOM) < 0.15 * DEPTH_BOTTOM)
    else:
        vec = 0.01 * np.asarray(param)[0]
        print(f"gt_depth: photometric {photo_l:.6f}  "
              f"tx_est ({vec[0, 0]:+.4f}, {vec[1, 0]:+.4f})  "
              f"tx_true ({float(tx):+.4f}, {-float(tx):+.4f})")
        ok = (abs(vec[0, 0] - tx) < 0.1 * tx
              and abs(vec[1, 0] + tx) < 0.1 * tx)
    print(f"ABLATION {mode}:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    from mgnet_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--mode", default="full",
                   choices=["full", "gt_pose", "gt_depth"])
    p.add_argument("--width", type=int, default=W,
                   help="scene width; >= 384 makes the ablations "
                        "exercise the Pallas banded warp kernel "
                        "(e.g. --width 512 --pallas-warp fast: "
                        "end-to-end hardware validation that the "
                        "kernel's gradient fields drive the "
                        "optimization to the true structure)")
    p.add_argument("--pallas-warp", default="off",
                   choices=["off", "exact", "fast"])
    p.add_argument("--reduce", default="min",
                   choices=["min", "mean"],
                   help="photometric reduce for --mode full. On the "
                        "single-scene probe, 'min' over the two context "
                        "frames is DEGENERATE: with two independent "
                        "poses, prev can fit one plane and next the "
                        "other, so flat depth reaches the loss plateau "
                        "(observed: photometric 0.021 with collapsed "
                        "depth). 'mean' forces both frames to agree — "
                        "the same single-static-scene artifact and fix "
                        "documented for the gt_depth ablation. Real "
                        "multi-scene training keeps the reference's "
                        "'min' (occlusion handling).")
    p.add_argument("--weights", default="",
                   help="ImageNet-init npz for --mode full (the product "
                        "path); random init leaves the depth head's "
                        "sigmoid at its midpoint on an untrained "
                        "encoder, a collapse-prone start on the tiny "
                        "probe scene")
    args = p.parse_args()
    width = args.width

    if args.mode != "full":
        return run_ablation(args.mode, args.steps,
                            pallas_warp=args.pallas_warp, width=width)

    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.cityscapes import register_all_cityscapes_scene_seg
    from mgnet_tpu.train.trainer import Trainer, evaluate_dataset

    tmp = tempfile.mkdtemp(prefix="mgnet_depthfit_")
    make_dataset(tmp, width=width)
    register_all_cityscapes_scene_seg(tmp)

    cfg = get_default_config()
    cfg.WITH_PANOPTIC = False
    cfg.WITH_UNCERTAINTY = False
    cfg.SOLVER.MAX_ITER = args.steps
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.WARMUP_ITERS = 50
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
    cfg.TEST.EVAL_PERIOD = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (H,)
    cfg.INPUT.MAX_SIZE_TRAIN = width
    cfg.INPUT.CROP.ENABLED = False
    cfg.INPUT.COLOR_JITTER.ENABLED = False
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.INPUT.MIN_SIZE_TEST = H
    cfg.INPUT.MAX_SIZE_TEST = width
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = []
    # exact synthetic correspondences: the static-scene automask shortcut
    # would otherwise dominate the loss and starve depth of gradient
    cfg.MODEL.DEPTH_HEAD.AUTOMASK_LOSS = False
    cfg.MODEL.DEPTH_HEAD.PHOTOMETRIC_REDUCE_OP = args.reduce
    cfg.MODEL.POST_PROCESSING.USE_DGC_SCALING = False  # GT-median scaling
    cfg.DATASETS.TRAIN = ("cityscapes_fine_scene_seg_train",)
    cfg.DATASETS.TEST = ("cityscapes_fine_scene_seg_train",)
    cfg.DATALOADER.NUM_WORKERS = 2
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights
    cfg.OUTPUT_DIR = os.path.join(tmp, "out")
    cfg.MESH.DATA = 1

    trainer = Trainer(cfg)
    trainer.train()

    mpath = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
    if os.path.exists(mpath):
        lines = [json.loads(l) for l in open(mpath)]
        for rec in lines[:: max(1, len(lines) // 8)]:
            print({k: round(v, 4) for k, v in rec.items()
                   if k in ("iteration", "loss_photometric",
                            "loss_smoothness", "loss_total")})

    results = evaluate_dataset(
        cfg, trainer.model,
        trainer.state.params, trainer.state.batch_stats,
    )
    d = results["depth"]
    print(json.dumps({k: round(float(v), 4) for k, v in d.items()},
                     indent=2))
    ok = d["Abs Rel"] < 0.15
    print("DEPTH OVERFIT VALIDATION:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
