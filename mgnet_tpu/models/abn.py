"""Activated Batch Normalization (conv + cross-replica BN + activation).

This is the TPU-native replacement for the reference's InPlaceABNSync
(third-party C++/CUDA extension, used at every conv site — reference:
mgnet/modeling/layers.py:9, res_net.py:6; see SURVEY.md §2.9).

Design:
* Under pjit with a global batch view, ``jnp.mean`` over the batch axis IS
  the cross-replica statistic — XLA inserts the all-reduce over the data
  mesh axis automatically. This replaces InPlaceABNSync's per-layer NCCL
  all-reduce (group=dist.group.WORLD) with compiler-scheduled ICI
  collectives, and composes with shard_map via ``axis_name`` if needed.
* The memory-saving "in-place" trick is unnecessary on TPU: XLA
  rematerialization (jax.checkpoint on the train step) provides the same
  activation-memory savings.
* Matches inplace_abn defaults: eps=1e-5, leaky_relu(0.01) activation, and
  the reference's momentum=0.01 running-stat update
  (running = 0.99 * running + 0.01 * batch).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ABN", "ConvABN", "kaiming_normal_fan_out", "mgnet_xavier_init"]

# torch BN update: running = (1 - m) * running + m * batch, m = 0.01.
# flax BatchNorm: ra = momentum * ra + (1 - momentum) * batch.
BN_MOMENTUM = 0.99
BN_EPS = 1e-5


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """He-normal with fan_out mode over HWIO conv kernels.

    Parity: detectron2 c2_msra_fill used for the backbone
    (reference: res_net.py:64-66).
    """
    fan_out = shape[0] * shape[1] * shape[-1]  # kh * kw * out_c
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def mgnet_xavier_init(key, shape, dtype=jnp.float32):
    """kaiming_normal with a=1 (fan_in leaky-relu gain), HWIO kernels.

    Parity: reference mgnet_xavier_fill (mgnet/modeling/layers.py:325-328):
    torch kaiming_normal_(a=1) => std = sqrt(2 / (1 + a^2) / fan_in)
    = sqrt(1 / fan_in).
    """
    fan_in = shape[0] * shape[1] * shape[2]  # kh * kw * in_c
    std = jnp.sqrt(1.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


_INITS = {
    "default": kaiming_normal_fan_out,  # backbone / c2_msra
    "xavier": mgnet_xavier_init,
    "msra": kaiming_normal_fan_out,
}


class BatchNormTorch(nn.Module):
    """BatchNorm with torch/inplace_abn-exact training semantics.

    Same math and variable layout ('scale'/'bias' params, 'mean'/'var'
    batch_stats) as flax nn.BatchNorm, with two reference-parity fixes the
    golden gradient ladder surfaced (tests/test_golden_train_step.py):

    * ``fast_variance=False`` computes var in two passes,
      mean((x - mean)^2), like torch. The default one-pass
      E[x^2] - E[x]^2 catastrophically cancels on POOLED inputs
      ([B, 1, 1, C] attention/GCM sites, N = batch): measured ~3-6%
      backbone gradient error at batch 2 in f32. Spatial BNs keep the
      fast path (probe-verified exact to 1e-11 cosine).
    * The running-variance update stores the UNBIASED variance
      (var * n/(n-1)), matching torch BatchNorm/inplace_abn
      (reference: every ABN site, e.g. res_net.py:49). flax stores the
      biased batch variance — a 9% eval-var understatement at n=12 on
      the pooled sites.

    Statistics are computed in float32 regardless of ``dtype``;
    ``axis_name`` pmeans them across the mesh axis under shard_map/pmap
    (cross-replica sync-BN; under global-batch pjit the plain mean is
    already global).
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    fast_variance: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: bool = False) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (features,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))

            def dist_mean(*vals):
                mus = tuple(v.mean(axes) for v in vals)
                if self.axis_name is not None:
                    stacked = jax.lax.pmean(jnp.stack(mus), self.axis_name)
                    mus = tuple(stacked[i] for i in range(len(vals)))
                return mus if len(vals) > 1 else mus[0]

            if self.fast_variance:
                mean, mean2 = dist_mean(xf, xf * xf)
                var = jnp.maximum(0.0, mean2 - mean * mean)
            else:
                mean = dist_mean(xf)
                var = dist_mean(jnp.square(xf - mean))

            if not self.is_initializing():
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                correction = n / (n - 1) if n > 1 else 1.0
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var * correction

        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * mul + bias
        return y.astype(self.dtype or x.dtype)


class ABN(nn.Module):
    """BatchNorm + activation over the channel axis of NHWC tensors.

    activation: 'leaky_relu' (slope 0.01, inplace_abn default) or 'identity'.
    Cross-replica sync happens implicitly through global-batch pjit
    semantics; ``axis_name`` forces an explicit pmean when tracing under
    shard_map/pmap. Set ``fast_variance=False`` at pooled ([B,1,1,C])
    sites — see BatchNormTorch.
    """

    activation: str = "leaky_relu"
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    fast_variance: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = BatchNormTorch(
            momentum=self.momentum,
            epsilon=self.epsilon,
            fast_variance=self.fast_variance,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="BatchNorm_0",
        )(x, use_running_average=not train)
        if self.activation == "leaky_relu":
            y = nn.leaky_relu(y, negative_slope=0.01)
        elif self.activation != "identity":
            raise ValueError(f"Unsupported ABN activation: {self.activation}")
        return y


class ConvABN(nn.Module):
    """Conv2D (no bias) followed by ABN — the reference's Conv2d+InPlaceABNSync
    building block (e.g. mgnet/modeling/layers.py:55-74)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    activation: str = "leaky_relu"
    init_method: str = "default"
    fast_variance: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # torch-style symmetric padding k//2 (flax "SAME" pads (lo, hi) =
        # (k//2 - 1, k//2) at stride 2 — a one-pixel window shift vs the
        # reference's nn.Conv2d(padding=k//2))
        kh, kw = tuple(self.kernel_size)
        y = nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=tuple(self.strides),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            use_bias=False,
            kernel_init=_INITS[self.init_method],
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return ABN(
            activation=self.activation,
            fast_variance=self.fast_variance,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="abn",
        )(y, train=train)
