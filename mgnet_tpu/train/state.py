"""Train state: params + BN stats + optimizer state as one pytree.

Replaces the reference's detectron2 DefaultTrainer state (model module,
optimizer, scheduler, AMP scaler — tools/train_net.py:37-170) with a single
immutable flax struct updated by the compiled train step. The homoscedastic
task-uncertainty parameters (reference mg_net.py:104-107 log_vars) live in
the same parameter tree under 'log_vars' so they are optimized jointly
(with wd=0 and base LR, reference solver/build.py:60-62).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state"]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any          # {'model': ..., optional 'log_vars': [5]}
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
        )


def create_train_state(cfg, model, rng: jax.Array,
                       sample_shape=(1, 64, 64, 3),
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    """Initialize parameters (train=True so all MSC heads exist) and the
    optimizer state."""
    from mgnet_tpu.solver import build_optimizer

    dummy = jnp.zeros(sample_shape, jnp.float32)
    kwargs = {}
    if model.with_depth:
        kwargs = dict(image_prev=dummy, image_next=dummy)
    variables = model.init(
        rng, dummy, method=type(model).forward_train, **kwargs
    )
    params = {"model": variables["params"]}
    if cfg.WITH_UNCERTAINTY:
        params["log_vars"] = jnp.zeros((5,), jnp.float32)
    batch_stats = variables.get("batch_stats", {})

    if tx is None:
        tx, _ = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
    )
