#!/usr/bin/env python
"""Convert torchvision ResNet-18/34 weights to MGNet-TPU init format.

Parity with reference: tools/convert-torchvision-to-mgnet.py — maps a
torchvision ResNet state_dict onto the backbone and the pose encoder; the
pose encoder's stem conv is tiled 3x over the 9-channel input and divided
by 3 (reference :36-41). The reference combines a semi-weakly-supervised
R18 for the backbone and a vanilla R18 for the pose net (initialize.sh).

Usage:
  python tools/convert_torchvision_weights.py \
      --backbone swsl_resnet18.pth --pose resnet18.pth \
      --output weights/imagenet_weights.npz

Output: an .npz of flat 'path/to/leaf' -> array entries consumed by
mgnet_tpu.utils.weights.load_pretrained_npz.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGE_BLOCKS = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3]}


def _to_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_resnet(state_dict, prefix: str, depth: int = 18,
                   expand_in_channels: int = 0) -> dict:
    """Map a torchvision ResNet state_dict to our flat key space.

    Args:
        prefix: e.g. 'backbone' or 'pose_net/encoder'.
        expand_in_channels: if >0, tile the stem conv input channels to
            this count and divide by (expand/3) — the reference's pose
            stem expansion (convert-torchvision-to-mgnet.py:36-41).
    """
    out = {}

    def put_conv(dst, w):
        out[f"{prefix}/{dst}/conv/kernel"] = _to_hwio(w)

    def put_bn(dst, src):
        out[f"{prefix}/{dst}/abn/BatchNorm_0/scale"] = state_dict[f"{src}.weight"]
        out[f"{prefix}/{dst}/abn/BatchNorm_0/bias"] = state_dict[f"{src}.bias"]
        out[f"{prefix}/{dst}/abn/BatchNorm_0/mean"] = state_dict[
            f"{src}.running_mean"]
        out[f"{prefix}/{dst}/abn/BatchNorm_0/var"] = state_dict[
            f"{src}.running_var"]

    stem_w = state_dict["conv1.weight"]
    if expand_in_channels:
        reps = expand_in_channels // stem_w.shape[1]
        stem_w = np.concatenate([stem_w] * reps, axis=1) / reps
    put_conv("stem/conv1", stem_w)
    put_bn("stem/conv1", "bn1")

    for stage_idx, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            src = f"layer{stage_idx + 1}.{b}"
            dst = f"res{stage_idx + 2}_block{b}"
            put_conv(f"{dst}/conv1", state_dict[f"{src}.conv1.weight"])
            put_bn(f"{dst}/conv1", f"{src}.bn1")
            put_conv(f"{dst}/conv2", state_dict[f"{src}.conv2.weight"])
            put_bn(f"{dst}/conv2", f"{src}.bn2")
            if f"{src}.downsample.0.weight" in state_dict:
                put_conv(f"{dst}/shortcut",
                         state_dict[f"{src}.downsample.0.weight"])
                put_bn(f"{dst}/shortcut", f"{src}.downsample.1")
    return out


def main():
    import torch

    p = argparse.ArgumentParser()
    p.add_argument("--backbone", required=True,
                   help="torchvision ResNet .pth for the main backbone")
    p.add_argument("--pose", default="",
                   help="torchvision ResNet .pth for the pose encoder")
    p.add_argument("--depth", type=int, default=18)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    def load_sd(path):
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return {k: v.numpy() for k, v in sd.items()
                if hasattr(v, "numpy")}

    flat = convert_resnet(load_sd(args.backbone), "backbone", args.depth)
    if args.pose:
        flat.update(convert_resnet(
            load_sd(args.pose), "pose_net/encoder", args.depth,
            expand_in_channels=9,
        ))
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    np.savez(args.output, **flat)
    print(f"Wrote {len(flat)} arrays to {args.output}")


if __name__ == "__main__":
    main()
