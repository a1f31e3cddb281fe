"""Solver tests: LR schedule shapes, param groups, wd masks, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mgnet_tpu.config import get_default_config
from mgnet_tpu.solver import (
    build_optimizer,
    lr_multiplier_tree,
    warmup_poly_schedule,
    weight_decay_mask_trees,
)
from mgnet_tpu.solver.build import freeze_mask_tree, warmup_cosine_schedule


class TestSchedule:
    def test_warmup_poly(self):
        s = warmup_poly_schedule(1e-4, 60000, 0.9, 0.1, 1000)
        assert np.isclose(float(s(0)), 1e-4 * 0.1, rtol=1e-3)
        # end of warmup: factor 1 * poly
        v = float(s(1000))
        assert np.isclose(v, 1e-4 * (1 - 1000 / 60000) ** 0.9, rtol=1e-4)
        assert float(s(59999)) < float(s(30000)) < float(s(1000))

    def test_warmup_cosine(self):
        s = warmup_cosine_schedule(1e-3, 1000, 0.1, 10)
        assert float(s(1000)) < 1e-6
        assert np.isclose(float(s(10)), 1e-3 * 0.5 * (
            1 + np.cos(np.pi * 10 / 1000)), rtol=1e-3)


class TestParamGroups:
    def _params(self):
        return {
            "model": {
                "backbone": {"stem": {"conv1": {
                    "conv": {"kernel": jnp.ones((3, 3, 3, 8))},
                    "abn": {"BatchNorm_0": {"scale": jnp.ones(8),
                                            "bias": jnp.zeros(8)}},
                }},
                "res2_block0": {"conv1": {"conv": {
                    "kernel": jnp.ones((3, 3, 8, 8))}}},
                },
                "sem_seg_head": {"head": {"predictor": {
                    "kernel": jnp.ones((1, 1, 8, 4))}}},
            },
            "log_vars": jnp.zeros(5),
        }

    def test_head_lr_multiplier(self):
        mults = lr_multiplier_tree(self._params(), 10.0)
        assert mults["model"]["sem_seg_head"]["head"]["predictor"][
            "kernel"] == 10.0
        assert mults["model"]["backbone"]["stem"]["conv1"]["conv"][
            "kernel"] == 1.0
        assert mults["log_vars"] == 1.0

    def test_wd_masks(self):
        masks = weight_decay_mask_trees(self._params())
        assert masks["weight"]["model"]["backbone"]["stem"]["conv1"][
            "conv"]["kernel"] is True
        assert masks["norm"]["model"]["backbone"]["stem"]["conv1"]["abn"][
            "BatchNorm_0"]["scale"] is True
        # log_vars: no decay anywhere
        assert masks["weight"]["log_vars"] is False
        assert masks["norm"]["log_vars"] is False

    def test_freeze_mask(self):
        m = freeze_mask_tree(self._params(), freeze_at=2)
        assert m["model"]["backbone"]["stem"]["conv1"]["conv"][
            "kernel"] == 0.0
        assert m["model"]["backbone"]["res2_block0"]["conv1"]["conv"][
            "kernel"] == 0.0
        assert m["model"]["sem_seg_head"]["head"]["predictor"][
            "kernel"] == 1.0

    def test_frozen_params_unchanged(self):
        cfg = get_default_config()
        cfg.MODEL.BACKBONE.FREEZE_AT = 2
        params = self._params()
        tx, _ = build_optimizer(cfg, params)
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        stem_upd = updates["model"]["backbone"]["stem"]["conv1"]["conv"][
            "kernel"]
        head_upd = updates["model"]["sem_seg_head"]["head"]["predictor"][
            "kernel"]
        assert float(jnp.abs(stem_upd).max()) == 0.0
        assert float(jnp.abs(head_upd).max()) > 0.0
