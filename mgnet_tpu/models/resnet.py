"""ResNet-18/34 encoder with sync-ABN, NHWC, for TPU.

Behavioral parity with reference: mgnet/modeling/res_net.py
(BasicStem 7x7/s2 + 3x3/s2 maxpool; BasicBlock with InPlaceABNSync norms,
identity-activation on conv2/shortcut, residual add then ReLU; stages
res2..res5 with strides 4/8/16/32; depth 18 or 34; freeze_at).

TPU-first: flax modules over NHWC, bf16 compute / fp32 params; the
cross-GPU sync-BN collective becomes implicit global-batch statistics
under pjit (see models/abn.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mgnet_tpu.models.abn import ABN, ConvABN

__all__ = ["ResNetABN", "BasicBlock", "BasicStem", "RESNET_STAGE_BLOCKS"]

RESNET_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class BasicStem(nn.Module):
    """7x7 stride-2 conv-ABN + 3x3 stride-2 max pool (overall stride 4)."""

    out_channels: int = 64
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvABN(
            self.out_channels, kernel_size=(7, 7), strides=(2, 2),
            init_method="msra", axis_name=self.axis_name, dtype=self.dtype,
            name="conv1",
        )(x, train=train)
        # torch max_pool2d(kernel=3, stride=2, padding=1)
        y = nn.max_pool(
            y, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        return y


class BasicBlock(nn.Module):
    """Two 3x3 conv-ABN layers + projection shortcut, residual ReLU.

    conv1 uses leaky-relu ABN; conv2 and the shortcut use identity-activation
    ABN; the sum passes through ReLU (reference: res_net.py:69-79).
    """

    out_channels: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        out = ConvABN(
            self.out_channels, strides=(self.stride, self.stride),
            init_method="msra", axis_name=self.axis_name, dtype=self.dtype,
            name="conv1",
        )(x, train=train)
        out = ConvABN(
            self.out_channels, activation="identity", init_method="msra",
            axis_name=self.axis_name, dtype=self.dtype, name="conv2",
        )(out, train=train)
        if in_channels != self.out_channels:
            shortcut = ConvABN(
                self.out_channels, kernel_size=(1, 1),
                strides=(self.stride, self.stride), activation="identity",
                init_method="msra", axis_name=self.axis_name, dtype=self.dtype,
                name="shortcut",
            )(x, train=train)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class ResNetABN(nn.Module):
    """ResNet-18/34 returning a feature pyramid dict.

    Args mirror the reference config keys (MODEL.RESNETS.*); ``in_channels``
    can be 9 for the pose encoder's 3-frame concat input
    (reference: layers.py:142-144).
    """

    depth: int = 18
    stem_out_channels: int = 64
    res2_out_channels: int = 64
    out_features: Sequence[str] = ("res3", "res4", "res5")
    freeze_at: int = 0  # weight freezing is applied by the solver mask
    remat: bool = False  # rematerialize blocks (activation memory savings)
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        blocks_per_stage = RESNET_STAGE_BLOCKS[self.depth]
        # jax.checkpoint per residual block: trades recompute for activation
        # HBM — the XLA-native replacement for InPlaceABN's in-place memory
        # trick (SURVEY.md §2.9).
        block_cls = (
            nn.remat(BasicBlock, static_argnums=(2,)) if self.remat
            else BasicBlock
        )
        features: Dict[str, jnp.ndarray] = {}
        y = BasicStem(
            self.stem_out_channels, axis_name=self.axis_name, dtype=self.dtype,
            name="stem",
        )(x, train=train)
        features["stem"] = y

        out_channels = self.res2_out_channels
        for idx, num_blocks in enumerate(blocks_per_stage):
            stage_name = f"res{idx + 2}"
            first_stride = 1 if idx == 0 else 2
            for b in range(num_blocks):
                y = block_cls(
                    out_channels,
                    stride=first_stride if b == 0 else 1,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"{stage_name}_block{b}",
                )(y, train)
            features[stage_name] = y
            out_channels *= 2

        return {k: v for k, v in features.items() if k in set(self.out_features)}

    @staticmethod
    def output_channels(depth: int, res2_out_channels: int = 64) -> Dict[str, int]:
        return {
            "res2": res2_out_channels,
            "res3": res2_out_channels * 2,
            "res4": res2_out_channels * 4,
            "res5": res2_out_channels * 8,
        }

    @staticmethod
    def output_strides() -> Dict[str, int]:
        return {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
