"""MGNet decoder building blocks: GCM, ARM, FFM, decoder, heads, PoseCNN.

Behavioral parity with reference: mgnet/modeling/layers.py
(GlobalContextModule, AttentionRefinementModule, FeatureFusionModule,
MGNetDecoder, MGNetHead, PoseCNN — BiSeNet-style decoder as in TorchSeg).

TPU-first: NHWC flax modules, nearest upsampling via static gather,
global average pooling as a plain spatial mean (fuses under XLA), and
bf16 compute with fp32 BN statistics.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mgnet_tpu.geometry.image import interpolate_nearest
from mgnet_tpu.models.abn import ConvABN, mgnet_xavier_init
from mgnet_tpu.models.resnet import ResNetABN

__all__ = [
    "GlobalContextModule",
    "AttentionRefinementModule",
    "FeatureFusionModule",
    "MGNetDecoder",
    "MGNetHead",
    "PoseCNN",
]


def _global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 1, 1, C] spatial mean (reference
    FastGlobalAvgPool2d, layers.py:170-184)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


class GlobalContextModule(nn.Module):
    """Global avg-pool -> 1x1 conv-ABN -> nearest-upsample to input size.

    Parity: reference layers.py:187-218.
    """

    out_channels: int = 128
    init_method: str = "xavier"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = _global_avg_pool(x)
        # pooled [B,1,1,C] input: two-pass variance (fast E[x^2]-E[x]^2
        # cancels catastrophically at N=batch; see abn.BatchNormTorch)
        y = ConvABN(
            self.out_channels, kernel_size=(1, 1), init_method=self.init_method,
            fast_variance=False,
            axis_name=self.axis_name, dtype=self.dtype, name="conv",
        )(y, train=train)
        # nearest-upsample of a 1x1 map == broadcast
        return jnp.broadcast_to(y, (x.shape[0], x.shape[1], x.shape[2], self.out_channels))


class AttentionRefinementModule(nn.Module):
    """3x3 conv-ABN then channel attention (pool -> 1x1 conv-ABN-identity
    -> sigmoid) multiplied in.

    Parity: reference layers.py:221-267.
    """

    out_channels: int
    init_method: str = "xavier"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fm = ConvABN(
            self.out_channels, kernel_size=(3, 3), init_method=self.init_method,
            axis_name=self.axis_name, dtype=self.dtype, name="conv",
        )(x, train=train)
        atten = _global_avg_pool(fm)
        # pooled input: two-pass variance (see GlobalContextModule note)
        atten = ConvABN(
            self.out_channels, kernel_size=(1, 1), activation="identity",
            init_method=self.init_method, fast_variance=False,
            axis_name=self.axis_name, dtype=self.dtype, name="attention_conv",
        )(atten, train=train)
        atten = nn.sigmoid(atten)
        return fm * atten


class FeatureFusionModule(nn.Module):
    """concat -> 1x1 conv-ABN -> channel attention -> fm + fm * atten.

    Parity: reference layers.py:270-322 (attention branch is
    pool -> 1x1 conv + ReLU -> 1x1 conv -> sigmoid, both convs bias-free).
    """

    out_channels: int
    init_method: str = "xavier"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fsp: jnp.ndarray, fcp: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        fm = jnp.concatenate([fsp, fcp], axis=-1)
        fm = ConvABN(
            self.out_channels, kernel_size=(1, 1), init_method=self.init_method,
            axis_name=self.axis_name, dtype=self.dtype, name="conv",
        )(fm, train=train)
        atten = _global_avg_pool(fm)
        atten = nn.Conv(
            self.out_channels, (1, 1), use_bias=False,
            kernel_init=mgnet_xavier_init, dtype=self.dtype,
            param_dtype=jnp.float32, name="attention_conv1",
        )(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(
            self.out_channels, (1, 1), use_bias=False,
            kernel_init=mgnet_xavier_init, dtype=self.dtype,
            param_dtype=jnp.float32, name="attention_conv2",
        )(atten)
        atten = nn.sigmoid(atten)
        return fm + fm * atten


class MGNetDecoder(nn.Module):
    """BiSeNet-style decoder over (res5, res4, res3) + global context.

    Parity: reference layers.py:22-94 — ARM on res5/res4, add running
    context feature, nearest-upsample to the next-finer scale, 3x3 refine
    conv; finally FFM fuses with res3. Returns (fused, msc_features) where
    msc_features are the post-add ARM maps at strides 32 and 16 (used by the
    depth head's multi-scale heads).
    """

    arm_channels: Sequence[int] = (128, 128)
    refine_channels: Sequence[int] = (128, 128)
    ffm_channels: int = 256
    init_method: str = "xavier"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 train: bool = False):
        # coarse -> fine: res5 (stride 32), res4 (16), res3 (8)
        coarse = [features["res5"], features["res4"]]
        finest = features["res3"]
        last_fm = features["global_context"]
        msc_features: List[jnp.ndarray] = []
        for i, fm_in in enumerate(coarse):
            fm = AttentionRefinementModule(
                self.arm_channels[i], init_method=self.init_method,
                axis_name=self.axis_name, dtype=self.dtype, name=f"arm{i}",
            )(fm_in, train=train)
            fm = fm + last_fm
            msc_features.append(fm)
            next_shape = (coarse[i + 1].shape[1:3] if i + 1 < len(coarse)
                          else finest.shape[1:3])
            last_fm = interpolate_nearest(fm, next_shape)
            last_fm = ConvABN(
                self.refine_channels[i], kernel_size=(3, 3),
                init_method=self.init_method, axis_name=self.axis_name,
                dtype=self.dtype, name=f"refine{i}",
            )(last_fm, train=train)

        y = FeatureFusionModule(
            self.ffm_channels, init_method=self.init_method,
            axis_name=self.axis_name, dtype=self.dtype, name="ffm",
        )(finest, last_fm, train=train)
        return y, msc_features


class MGNetHead(nn.Module):
    """3x3 conv-ABN -> 1x1 bias-free predictor conv.

    Parity: reference layers.py:97-127.
    """

    head_channels: int
    num_classes: int
    init_method: str = "xavier"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvABN(
            self.head_channels, kernel_size=(3, 3), init_method=self.init_method,
            axis_name=self.axis_name, dtype=self.dtype, name="head",
        )(x, train=train)
        y = nn.Conv(
            self.num_classes, (1, 1), use_bias=False,
            kernel_init=(mgnet_xavier_init if self.init_method == "xavier"
                         else nn.initializers.lecun_normal()),
            dtype=self.dtype, param_dtype=jnp.float32, name="predictor",
        )(y)
        return y


class PoseCNN(nn.Module):
    """Pose regression network: ResNet encoder over the 3-frame concat
    (9 input channels) + 4-conv decoder, spatial mean, scaled by 0.01.

    Parity: reference layers.py:130-167. Output: [B, num_context, 6]
    with channel order (tx, ty, tz, rx, ry, rz).
    """

    depth: int = 18
    num_context_images: int = 2
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = ResNetABN(
            depth=self.depth, out_features=("res5",), remat=self.remat,
            axis_name=self.axis_name, dtype=self.dtype, name="encoder",
        )(images, train=train)
        y = feats["res5"]
        conv_kwargs = dict(
            kernel_init=mgnet_xavier_init, dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        y = nn.relu(nn.Conv(256, (1, 1), name="conv1", **conv_kwargs)(y))
        y = nn.relu(nn.Conv(256, (3, 3), name="conv2", **conv_kwargs)(y))
        y = nn.relu(nn.Conv(256, (3, 3), name="conv3", **conv_kwargs)(y))
        y = nn.Conv(6 * self.num_context_images, (1, 1), name="conv4",
                    **conv_kwargs)(y)
        y = jnp.mean(y, axis=(1, 2))  # [B, 6 * num_context]
        y = 0.01 * y.reshape(y.shape[0], self.num_context_images, 6)
        return y.astype(jnp.float32)
