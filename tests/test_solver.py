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


class TestTorchGoldenWeightDecay:
    """Golden parity vs torch optimizers with wd>0 + full-model clipping.

    Reference semantics (tools/train_net.py:118-154):
    FullModelGradientClippingOptimizer clips the RAW gradients to global
    norm CLIP_VALUE inside step(), then the base optimizer runs — Adam/SGD
    fold L2 (wd*p) into the clipped gradient before the moments; AdamW
    applies decoupled decay p -= lr*wd*p outside the moments (unclipped).
    """

    WD, WD_BIAS, CLIP, LR, HEAD_F = 1e-2, 5e-3, 0.05, 1e-2, 10.0

    def _tiny_params(self):
        rng = np.random.RandomState(0)
        return {
            "model": {
                "backbone": {"conv": {
                    "kernel": jnp.asarray(rng.randn(6), jnp.float32),
                    "bias": jnp.asarray(rng.randn(3), jnp.float32),
                }},
                "sem_seg_head": {"predictor": {
                    "kernel": jnp.asarray(rng.randn(4), jnp.float32),
                }},
            },
        }

    def _cfg(self, opt):
        cfg = get_default_config()
        s = cfg.SOLVER
        s.OPTIMIZER = opt
        s.BASE_LR = self.LR
        s.WEIGHT_DECAY = self.WD
        s.WEIGHT_DECAY_BIAS = self.WD_BIAS
        s.WEIGHT_DECAY_NORM = 0.0
        s.HEAD_LR_FACTOR = self.HEAD_F
        s.CLIP_GRADIENTS.ENABLED = True
        s.CLIP_GRADIENTS.CLIP_VALUE = self.CLIP
        s.MOMENTUM = 0.9
        cfg.MODEL.BACKBONE.FREEZE_AT = 0
        return cfg

    def _run_pair(self, opt_name, n_steps=6):
        import torch

        params = self._tiny_params()
        cfg = self._cfg(opt_name)
        tx, schedule = build_optimizer(cfg, params)
        state = tx.init(params)

        # torch mirror: one tensor per leaf, param groups match the
        # reference's (head gets lr*HEAD_LR_FACTOR; biases WEIGHT_DECAY_BIAS)
        t_leaves = {
            "kernel": torch.tensor(
                np.asarray(params["model"]["backbone"]["conv"]["kernel"]),
                requires_grad=True),
            "bias": torch.tensor(
                np.asarray(params["model"]["backbone"]["conv"]["bias"]),
                requires_grad=True),
            "head": torch.tensor(
                np.asarray(
                    params["model"]["sem_seg_head"]["predictor"]["kernel"]),
                requires_grad=True),
        }
        groups = [
            {"params": [t_leaves["kernel"]], "lr": self.LR,
             "weight_decay": self.WD},
            {"params": [t_leaves["bias"]], "lr": self.LR,
             "weight_decay": self.WD_BIAS},
            {"params": [t_leaves["head"]], "lr": self.LR * self.HEAD_F,
             "weight_decay": self.WD},
        ]
        if opt_name == "ADAM":
            topt = torch.optim.Adam(groups)
        elif opt_name == "ADAMW":
            topt = torch.optim.AdamW(groups)
        else:
            topt = torch.optim.SGD(groups, momentum=0.9)

        rng = np.random.RandomState(42)
        for step in range(n_steps):
            g = {
                "kernel": rng.randn(6).astype(np.float32),
                "bias": rng.randn(3).astype(np.float32),
                "head": rng.randn(4).astype(np.float32),
            }
            grads = {"model": {
                "backbone": {"conv": {"kernel": jnp.asarray(g["kernel"]),
                                      "bias": jnp.asarray(g["bias"])}},
                "sem_seg_head": {"predictor": {
                    "kernel": jnp.asarray(g["head"])}},
            }}
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)

            # torch: set per-step lr (the jax side applies schedule(step)),
            # assign raw grads, clip full-model, step
            lr_t = float(schedule(step))
            topt.param_groups[0]["lr"] = lr_t
            topt.param_groups[1]["lr"] = lr_t
            topt.param_groups[2]["lr"] = lr_t * self.HEAD_F
            for k in t_leaves:
                t_leaves[k].grad = torch.tensor(g[k])
            torch.nn.utils.clip_grad_norm_(
                list(t_leaves.values()), self.CLIP)
            topt.step()

        got = {
            "kernel": np.asarray(
                params["model"]["backbone"]["conv"]["kernel"]),
            "bias": np.asarray(params["model"]["backbone"]["conv"]["bias"]),
            "head": np.asarray(
                params["model"]["sem_seg_head"]["predictor"]["kernel"]),
        }
        want = {k: v.detach().numpy() for k, v in t_leaves.items()}
        for k in got:
            np.testing.assert_allclose(
                got[k], want[k], rtol=0, atol=1e-5,
                err_msg=f"{opt_name} leaf {k}")

    def test_adam_wd_clip(self):
        self._run_pair("ADAM")

    def test_adamw_wd_clip(self):
        self._run_pair("ADAMW")

    def test_sgd_wd_clip(self):
        self._run_pair("SGD")


