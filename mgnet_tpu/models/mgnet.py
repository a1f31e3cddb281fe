"""MGNet meta-architecture: shared encoder, GCM, three decoder heads, pose net.

Behavioral parity with reference: mgnet/modeling/mg_net.py:53-857
(MGNet / MGNetSemSegHead / MGNetInsEmbedHead / MGNetSelfSupervisedDepthHead /
PoseCNN wiring / ExportableMGNet).

TPU-first redesign: instead of a stateful meta-arch with registries and
list-of-dict inputs, the model is a pure flax module over batched NHWC
tensors. Loss assembly, target handling and post-processing live outside
the module (mgnet_tpu/train, mgnet_tpu/losses, mgnet_tpu/postprocessing),
so the entire inference path can be composed and compiled as ONE XLA
executable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mgnet_tpu.geometry.depth import inv2depth
from mgnet_tpu.geometry.image import interpolate_bilinear
from mgnet_tpu.models.layers import (
    GlobalContextModule,
    MGNetDecoder,
    MGNetHead,
    PoseCNN,
)
from mgnet_tpu.models.resnet import ResNetABN

__all__ = ["MGNet", "SemSegHead", "InsEmbedHead", "DepthHead", "build_model"]


class SemSegHead(nn.Module):
    """Decoder + classifier head, upsampled x common_stride to full res.

    Parity: reference mg_net.py:523-610.
    """

    num_classes: int = 20
    common_stride: int = 8
    arm_channels: Sequence[int] = (128, 128)
    refine_channels: Sequence[int] = (128, 128)
    ffm_channels: int = 256
    head_channels: int = 256
    init_method: str = "xavier"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def _common(self):
        return dict(
            arm_channels=tuple(self.arm_channels),
            refine_channels=tuple(self.refine_channels),
            ffm_channels=self.ffm_channels,
            init_method=self.init_method,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(self, features, train: bool = False, upsample: bool = True):
        y, _ = MGNetDecoder(name="decoder", **self._common())(features, train=train)
        y = MGNetHead(
            self.head_channels, self.num_classes, self.init_method,
            axis_name=self.axis_name, dtype=self.dtype, name="head",
        )(y, train=train)
        if upsample:
            out_hw = (y.shape[1] * self.common_stride, y.shape[2] * self.common_stride)
            y = interpolate_bilinear(y, out_hw)
        return y


class InsEmbedHead(nn.Module):
    """Decoder + center (1ch, sigmoid) and offset (2ch) heads.

    Parity: reference mg_net.py:613-715. Offsets are multiplied by
    common_stride after upsampling so they are in output-pixel units;
    offset channel order is (dy, dx) as in the target generator.
    """

    common_stride: int = 8
    arm_channels: Sequence[int] = (128, 128)
    refine_channels: Sequence[int] = (128, 128)
    ffm_channels: int = 256
    head_channels: int = 256
    init_method: str = "xavier"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features, train: bool = False, upsample: bool = True):
        y, _ = MGNetDecoder(
            arm_channels=tuple(self.arm_channels),
            refine_channels=tuple(self.refine_channels),
            ffm_channels=self.ffm_channels,
            init_method=self.init_method,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="decoder",
        )(features, train=train)
        center = MGNetHead(
            self.head_channels, 1, self.init_method,
            axis_name=self.axis_name, dtype=self.dtype, name="center_head",
        )(y, train=train)
        offset = MGNetHead(
            self.head_channels, 2, self.init_method,
            axis_name=self.axis_name, dtype=self.dtype, name="offset_head",
        )(y, train=train)
        center = nn.sigmoid(center)
        if upsample:
            out_hw = (y.shape[1] * self.common_stride, y.shape[2] * self.common_stride)
            center = interpolate_bilinear(center, out_hw)
            offset = interpolate_bilinear(offset, out_hw) * self.common_stride
        return center, offset


class DepthHead(nn.Module):
    """Decoder + 1-3 inverse-depth heads (multi-scale during training).

    Parity: reference mg_net.py:726-829 — heads over [ffm(stride 8),
    msc[1](16), msc[0](32)]; activation sigmoid/0.5 -> inv depth in
    (0, 2); all scales upsampled to full resolution.
    """

    common_stride: int = 8
    arm_channels: Sequence[int] = (128, 128)
    refine_channels: Sequence[int] = (128, 128)
    ffm_channels: int = 256
    head_channels: int = 256
    init_method: str = "default"
    msc_loss: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features, train: bool = False, upsample: bool = True):
        y, msc = MGNetDecoder(
            arm_channels=tuple(self.arm_channels),
            refine_channels=tuple(self.refine_channels),
            ffm_channels=self.ffm_channels,
            init_method=self.init_method,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="decoder",
        )(features, train=train)
        use_msc = train and self.msc_loss
        # head inputs finest-first: ffm (s8), msc[1] (s16), msc[0] (s32)
        inputs = [y, msc[1], msc[0]] if use_msc else [y]
        strides = [self.common_stride, self.common_stride * 2,
                   self.common_stride * 4] if use_msc else [self.common_stride]
        out_hw = (y.shape[1] * self.common_stride, y.shape[2] * self.common_stride)
        inv_depths = []
        for i, (f, stride) in enumerate(zip(inputs, strides)):
            d = MGNetHead(
                self.head_channels, 1, self.init_method,
                axis_name=self.axis_name, dtype=self.dtype, name=f"head{i}",
            )(f, train=train)
            d = nn.sigmoid(d) / 0.5  # inverse depth in (0, 2)
            if upsample:
                d = interpolate_bilinear(d, out_hw)
            inv_depths.append(d.astype(jnp.float32))
        return inv_depths


class MGNet(nn.Module):
    """Joint panoptic + self-supervised-depth network.

    ``__call__`` consumes normalized NHWC images and returns the raw head
    outputs; the pose network runs via the ``pose`` method on the 9-channel
    3-frame concat (reference: mg_net.py:264).
    """

    num_classes: int = 20
    depth: int = 18
    gcm_channels: int = 128
    with_panoptic: bool = True
    with_depth: bool = True
    msc_depth_loss: bool = True
    common_stride: int = 8
    head_channels: int = 256
    ffm_channels: int = 256
    arm_channels: Sequence[int] = (128, 128)
    refine_channels: Sequence[int] = (128, 128)
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.backbone = ResNetABN(
            depth=self.depth, remat=self.remat,
            axis_name=self.axis_name, dtype=self.dtype,
        )
        self.global_context = GlobalContextModule(
            self.gcm_channels, axis_name=self.axis_name, dtype=self.dtype,
        )
        common = dict(
            common_stride=self.common_stride,
            arm_channels=tuple(self.arm_channels),
            refine_channels=tuple(self.refine_channels),
            ffm_channels=self.ffm_channels,
            head_channels=self.head_channels,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )
        # nn.remat on the heads keeps the full-resolution upsampled
        # logits out of the backward residual set (they are recomputed
        # from the stride-8 maps) — the dominant activation saving at
        # 1024x1024 crops.
        sem_cls = (nn.remat(SemSegHead, static_argnums=(2, 3))
                   if self.remat else SemSegHead)
        ins_cls = (nn.remat(InsEmbedHead, static_argnums=(2, 3))
                   if self.remat else InsEmbedHead)
        depth_cls = (nn.remat(DepthHead, static_argnums=(2, 3))
                     if self.remat else DepthHead)
        if self.with_panoptic:
            self.sem_seg_head = sem_cls(num_classes=self.num_classes, **common)
            self.ins_embed_head = ins_cls(**common)
        if self.with_depth:
            self.depth_head = depth_cls(msc_loss=self.msc_depth_loss, **common)
            self.pose_net = PoseCNN(
                depth=self.depth, remat=self.remat,
                axis_name=self.axis_name, dtype=self.dtype,
            )

    def features(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images, train=train)
        feats = dict(feats)
        feats["global_context"] = self.global_context(feats["res5"], train=train)
        return feats

    def __call__(self, images: jnp.ndarray, train: bool = False,
                 upsample: bool = True) -> Dict[str, Any]:
        """Raw forward on one (normalized) image batch."""
        feats = self.features(images, train=train)
        out: Dict[str, Any] = {}
        if self.with_panoptic:
            out["sem_seg"] = self.sem_seg_head(feats, train, upsample)
            out["center"], out["offset"] = self.ins_embed_head(
                feats, train, upsample
            )
        if self.with_depth:
            inv_depths = self.depth_head(feats, train, upsample)
            if train:
                out["inv_depths"] = inv_depths
            else:
                out["depth"] = inv2depth(inv_depths[0])
                # raw inverse depth for callers that upsample outside the
                # model (upsample-then-invert order must match the
                # reference, mg_net.py:810)
                out["inv_depth"] = inv_depths[0]
        return out

    def pose(self, images_cat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, H, W, 9] (cur|prev|next concat) -> [B, 2, 6] pose vectors."""
        return self.pose_net(images_cat, train=train)

    def forward_train(self, image: jnp.ndarray,
                      image_prev: Optional[jnp.ndarray] = None,
                      image_next: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        """Training forward: heads + pose net in one variable scope.

        Parity: reference mg_net.py:250-276 — the pose net consumes the
        channel-concat of (cur, prev, next) normalized frames; heads run on
        the current frame only.
        """
        out = self(image, train=True)
        if self.with_depth:
            assert image_prev is not None and image_next is not None
            cat = jnp.concatenate([image, image_prev, image_next], axis=-1)
            out["poses"] = self.pose_net(cat, train=True)
        return out


def build_model(cfg) -> MGNet:
    """Construct MGNet from a ConfigNode (reference: MGNet.from_config)."""
    dtype = jnp.bfloat16 if cfg.MODEL.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return MGNet(
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        depth=cfg.MODEL.RESNETS.DEPTH,
        gcm_channels=cfg.MODEL.GCM.GCM_CHANNELS,
        with_panoptic=cfg.WITH_PANOPTIC,
        with_depth=cfg.WITH_DEPTH,
        msc_depth_loss=cfg.MODEL.DEPTH_HEAD.MSC_LOSS,
        common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
        head_channels=cfg.MODEL.SEM_SEG_HEAD.HEAD_CHANNELS,
        ffm_channels=cfg.MODEL.SEM_SEG_HEAD.FFM_CHANNELS,
        arm_channels=tuple(cfg.MODEL.SEM_SEG_HEAD.ARM_CHANNELS),
        refine_channels=tuple(cfg.MODEL.SEM_SEG_HEAD.REFINE_CHANNELS),
        remat=cfg.MODEL.REMAT,
        dtype=dtype,
    )
