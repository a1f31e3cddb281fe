"""End-to-end train-step smoke tests: loss decreases on a tiny synthetic
batch; multi-device pjit sharding over the 8-device CPU mesh exercises the
gradient psum + cross-replica BN path (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgnet_tpu.config import get_default_config
from mgnet_tpu.data.synthetic import synthetic_train_batch
from mgnet_tpu.models.mgnet import build_model
from mgnet_tpu.parallel import create_mesh, shard_batch
from mgnet_tpu.train import create_train_state, make_train_step


def tiny_cfg(**overrides):
    cfg = get_default_config()
    cfg.MODEL.SEM_SEG_HEAD.OHEM_N_MIN = 256
    cfg.SOLVER.MAX_ITER = 100
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.MODEL.COMPUTE_DTYPE = "float32"  # CPU tests
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def make_batch(cfg, b=2, h=64, w=64):
    batch = synthetic_train_batch(
        b, h, w, with_panoptic=cfg.WITH_PANOPTIC, with_depth=cfg.WITH_DEPTH
    )
    return {k: jnp.asarray(v) for k, v in batch.items()}


class TestTrainStep:
    @pytest.mark.parametrize(
        "with_panoptic,with_depth",
        [(True, True), (True, False), (False, True)],
    )
    def test_loss_decreases(self, with_panoptic, with_depth):
        cfg = tiny_cfg(WITH_PANOPTIC=with_panoptic, WITH_DEPTH=with_depth)
        model = build_model(cfg)
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), sample_shape=(2, 64, 64, 3)
        )
        step = jax.jit(make_train_step(cfg, model))
        batch = make_batch(cfg)
        first = None
        for i in range(8):
            state, metrics = step(state, batch)
            total = float(metrics["loss_total"])
            assert np.isfinite(total)
            if first is None:
                first = total
        assert total < first, f"loss did not decrease: {first} -> {total}"

    def test_uncertainty_metrics_present(self):
        cfg = tiny_cfg()
        model = build_model(cfg)
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), sample_shape=(2, 64, 64, 3)
        )
        step = jax.jit(make_train_step(cfg, model))
        _, metrics = step(state, make_batch(cfg))
        for k in ["loss_sem_seg", "loss_center", "loss_offset",
                  "loss_photometric", "loss_smoothness"]:
            assert k in metrics and k + "_raw" in metrics
            assert k + "_uncertainty" in metrics

    def test_log_vars_receive_gradients(self):
        cfg = tiny_cfg()
        model = build_model(cfg)
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), sample_shape=(2, 64, 64, 3)
        )
        step = jax.jit(make_train_step(cfg, model))
        before = np.asarray(state.params["log_vars"])
        state, _ = step(state, make_batch(cfg))
        after = np.asarray(state.params["log_vars"])
        assert not np.allclose(before, after)

    def test_grad_accum_exactness(self):
        """GRAD_ACCUM_STEPS=2 on a duplicated batch must produce the same
        parameter update and metrics as one step on the un-duplicated
        half: identical micro-batches give identical micro-gradients, so
        their average equals either one (VERDICT r2 #4 — exact
        batch-12-schedule semantics on fewer chips)."""
        cfg = tiny_cfg()
        cfg.SOLVER.GRAD_ACCUM_STEPS = 2
        model = build_model(cfg)
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), sample_shape=(2, 64, 64, 3)
        )
        b2 = make_batch(cfg, b=2)
        b4 = {k: jnp.concatenate([v, v], axis=0) for k, v in b2.items()}
        step_acc = jax.jit(make_train_step(cfg, model))
        cfg1 = tiny_cfg()
        step_one = jax.jit(make_train_step(cfg1, model))

        s_acc, m_acc = step_acc(state, b4)
        s_one, m_one = step_one(state, b2)

        for k in m_one:
            np.testing.assert_allclose(
                float(m_acc[k]), float(m_one[k]), rtol=1e-5, atol=1e-6,
                err_msg=f"metric {k} diverged under grad accumulation")
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(
                jax.device_get(s_acc.params))[0],
                key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(
                jax.device_get(s_one.params))[0],
                key=lambda kv: str(kv[0])),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"param {pa} diverged under grad accumulation")
        assert int(s_acc.step) == int(s_one.step) == 1


class TestMultiDevice:
    def test_data_parallel_train_step(self):
        """Full train step sharded over an 8-device mesh."""
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        cfg = tiny_cfg()
        mesh = create_mesh(data=8, model=1)
        model = build_model(cfg)
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), sample_shape=(8, 32, 32, 3)
        )
        step_fn = make_train_step(cfg, model)
        batch = shard_batch(mesh, make_batch(cfg, b=8, h=32, w=32))
        state = jax.device_put(
            state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())
        )
        step = jax.jit(step_fn)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss_total"]))

    def test_sync_bn_matches_global_batch(self):
        """BN batch stats under sharded pjit equal the single-device global
        computation — the InPlaceABNSync replacement invariant."""
        from mgnet_tpu.models.resnet import ResNetABN

        model = ResNetABN(depth=18, out_features=("res5",))
        x = jnp.asarray(
            np.random.RandomState(0).rand(8, 32, 32, 3), jnp.float32
        )
        vars_ = model.init(jax.random.PRNGKey(0), x)

        def stats(v, xx):
            _, mut = model.apply(v, xx, train=True, mutable=["batch_stats"])
            return mut["batch_stats"]

        ref = jax.jit(stats)(vars_, x)

        mesh = create_mesh(data=8, model=1)
        xs = jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data"))
        )
        sharded = jax.jit(stats)(vars_, xs)

        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(sharded)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
