"""Multi-scale + horizontal-flip test-time augmentation.

Behavioral parity with reference: mgnet/modeling/mg_net.py:427-520
(forward_multi_scale_flip): scales {0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0}
x optional hflip; semantic logits are softmax-averaged; center/offset/depth
averaged; offsets are rescaled to original-image pixels and the x-offset is
negated when unflipping; depth is averaged in depth (not inverse-depth)
space.

TPU-first: a pure function over the model's ``upsample=False`` head
outputs; every scale is a separate static shape, so each compiles once and
caches.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp

from mgnet_tpu.geometry.depth import inv2depth
from mgnet_tpu.geometry.image import interpolate_bilinear

__all__ = ["multi_scale_flip_inference"]

DEFAULT_SCALES = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)


def multi_scale_flip_inference(
    model,
    variables,
    norm_images: jnp.ndarray,
    scales: Sequence[float] = DEFAULT_SCALES,
    flip: bool = True,
    with_panoptic: bool = True,
    with_depth: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Args:
        norm_images: [B, H, W, 3] already-normalized images.

    Returns averaged full-resolution 'sem_seg' (probabilities), 'center',
    'offset', 'depth'.
    """
    b, h, w, _ = norm_images.shape
    common_stride = model.common_stride
    n_passes = 0
    avg: Dict[str, Optional[jnp.ndarray]] = {
        "sem_seg": None, "center": None, "offset": None, "depth": None,
    }

    def acc(key, value):
        avg[key] = value if avg[key] is None else avg[key] + value

    for scale in scales:
        sh, sw = int(h * scale), int(w * scale)
        x = interpolate_bilinear(norm_images, (sh, sw))
        # flip pair batched into ONE forward ([2B, ...]): halves the pass
        # count (14 -> 7) and feeds the MXU bigger batches at small
        # scales. Numerically identical to two passes — eval-mode BN is
        # batch-independent, and hflip commutes with the (reversal-
        # symmetric) align-corners upsample, so unflipping after the
        # full-res interpolation matches the reference's per-pass order
        # (mg_net.py:461-520).
        xi = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0) if flip else x
        out = model.apply(variables, xi, train=False, upsample=False)
        n_passes += 2 if flip else 1

        def unflip_add(t, negate_x=False):
            if not flip:
                return t
            tf = t[b:, :, ::-1]
            if negate_x:
                tf = tf.at[..., 1].multiply(-1.0)  # negate x-offsets
            return t[:b] + tf

        if with_panoptic:
            r = interpolate_bilinear(
                out["sem_seg"].astype(jnp.float32), (h, w)
            )
            r = jnp.exp(r - jnp.max(r, axis=-1, keepdims=True))
            r = r / jnp.sum(r, axis=-1, keepdims=True)
            c = interpolate_bilinear(
                out["center"].astype(jnp.float32), (h, w)
            )
            o = interpolate_bilinear(
                out["offset"].astype(jnp.float32), (h, w)
            ) * (common_stride / scale)
            acc("sem_seg", unflip_add(r))
            acc("center", unflip_add(c))
            acc("offset", unflip_add(o, negate_x=True))
        if with_depth:
            # eval path returns depth = 1/inv_depth at head resolution;
            # recover the raw inverse-depth prediction, interpolate it
            # at full res, then invert — matching the reference, which
            # interpolates the head logits before inv2depth
            # (mg_net.py:497-506).
            inv = 1.0 / jnp.clip(
                out["depth"].astype(jnp.float32), min=1e-6
            )
            d_full = inv2depth(interpolate_bilinear(inv, (h, w)))
            acc("depth", unflip_add(d_full))

    n = len(scales) * (2 if flip else 1)
    result = {}
    for k, v in avg.items():
        if v is not None:
            result[k] = v / n
    return result
