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

from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from mgnet_tpu.models.abn import ABN, ConvABN, kaiming_normal_fan_out

__all__ = ["ResNetABN", "BasicBlock", "BasicStem", "RESNET_STAGE_BLOCKS"]

RESNET_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder (named so the param path matches
    nn.Conv's ``<name>/kernel``, keeping weight-import compatibility)."""

    shape: Sequence[int]
    init: Callable

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", self.init, tuple(self.shape))


def _space_to_depth(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def _stem_kernel_s2d(w7: jnp.ndarray) -> jnp.ndarray:
    """[7,7,Cin,Cout] stride-2 kernel -> [4,4,4*Cin,Cout] space-to-depth form.

    out[i,j] = sum_{u,v} w7[u,v] x[2i+u-3, 2j+v-3] becomes a stride-1 4x4
    conv over the factor-2 space-to-depth input with
    w2[a,b,(p*2+q)*Cin+c] = w7[2a+p-1, 2b+q-1, c] (zero where out of
    range) and padding (2,1) per spatial dim. Exact (a weight
    permutation), differentiable, and ~2.2x faster on v5e: the Cin=3
    stem conv wastes the MXU contraction lanes (4.3 ms -> 1.7 ms at
    1024x2048, tools bench; see BENCH_NOTES.md).
    """
    cin, cout = w7.shape[2], w7.shape[3]
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w8 = w8.reshape(4, 2, 4, 2, cin, cout)          # [a, p, b, q, c, o]
    return w8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)


class _S2DConvABN(nn.Module):
    """7x7 stride-2 conv-ABN evaluated in space-to-depth form.

    Drop-in for ``ConvABN(kernel_size=(7,7), strides=(2,2))`` with the
    IDENTICAL variable tree (``conv/kernel`` + ``abn/...``) so ImageNet
    grafting (tools/convert_torchvision_weights.py) is unaffected.
    Padding follows torch Conv2d(padding=3) semantics.
    """

    out_channels: int = 64
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        w7 = _ConvKernel(
            shape=(7, 7, cin, self.out_channels),
            init=kaiming_normal_fan_out,
            name="conv",
        )()
        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        _, h, w, _ = x.shape
        if h % 2 == 0 and w % 2 == 0:
            xs = _space_to_depth(xd, 2)
            w2 = _stem_kernel_s2d(w7).astype(dtype)
            y = lax.conv_general_dilated(
                xs, w2, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=lax.conv_dimension_numbers(
                    xs.shape, w2.shape, ("NHWC", "HWIO", "NHWC")),
            )
        else:
            y = lax.conv_general_dilated(
                xd, w7.astype(dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=lax.conv_dimension_numbers(
                    xd.shape, w7.shape, ("NHWC", "HWIO", "NHWC")),
            )
        return ABN(
            axis_name=self.axis_name, dtype=self.dtype, name="abn",
        )(y, train=train)


class BasicStem(nn.Module):
    """7x7 stride-2 conv-ABN + 3x3 stride-2 max pool (overall stride 4)."""

    out_channels: int = 64
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = _S2DConvABN(
            self.out_channels, axis_name=self.axis_name, dtype=self.dtype,
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
