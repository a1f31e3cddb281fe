"""Model shape / behavior tests for backbone, decoder, heads, pose net."""

import jax
import jax.numpy as jnp
import numpy as np

from mgnet_tpu.models.mgnet import MGNet
from mgnet_tpu.models.resnet import ResNetABN


def test_resnet_feature_pyramid():
    model = ResNetABN(depth=18)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(vars_, x)
    assert set(feats) == {"res3", "res4", "res5"}
    assert feats["res3"].shape == (1, 8, 12, 128)
    assert feats["res4"].shape == (1, 4, 6, 256)
    assert feats["res5"].shape == (1, 2, 3, 512)


def test_resnet34_depth():
    model = ResNetABN(depth=34, out_features=("res5",))
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(vars_, x)
    assert feats["res5"].shape == (1, 1, 1, 512)


def test_mgnet_inference_outputs():
    model = MGNet(num_classes=20)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out["sem_seg"].shape == (1, 64, 96, 20)
    assert out["center"].shape == (1, 64, 96, 1)
    assert out["offset"].shape == (1, 64, 96, 2)
    assert out["depth"].shape == (1, 64, 96, 1)
    # center is sigmoid-activated -> [0, 1]
    c = np.asarray(out["center"], np.float32)
    assert (c >= 0).all() and (c <= 1).all()
    # depth = 1 / inv_depth with inv_depth in (0, 2) -> >= 0.5
    d = np.asarray(out["depth"], np.float32)
    assert (d >= 0.5 - 1e-3).all()


def test_mgnet_training_msc_depth():
    model = MGNet(num_classes=20, msc_depth_loss=True)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=True)
    out, mutated = model.apply(
        vars_, x, train=True, mutable=["batch_stats"]
    )
    assert len(out["inv_depths"]) == 3
    for d in out["inv_depths"]:
        assert d.shape == (2, 64, 64, 1)
        v = np.asarray(d, np.float32)
        assert (v > 0).all() and (v < 2 + 1e-3).all()
    assert "batch_stats" in mutated


def test_pose_net():
    model = MGNet(num_classes=20, with_panoptic=False)
    x = jnp.zeros((2, 64, 64, 3))
    cat = jnp.zeros((2, 64, 64, 9))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    pose_vars = model.init(
        jax.random.PRNGKey(0), cat, train=False, method=MGNet.pose
    )
    poses = model.apply(pose_vars, cat, method=MGNet.pose)
    assert poses.shape == (2, 2, 6)
    assert poses.dtype == jnp.float32


def test_batch_stats_updated_in_train():
    model = ResNetABN(depth=18, out_features=("res5",))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )
    assert changed


def test_stem_s2d_matches_direct_conv():
    """Space-to-depth stem == plain 7x7 s2 conv (torch padding=3)."""
    import jax
    from jax import lax
    from mgnet_tpu.models.resnet import BasicStem, _stem_kernel_s2d

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    stem = BasicStem(out_channels=64)  # f32: exact comparison
    v = stem.init(jax.random.PRNGKey(0), x, train=False)
    w7 = v["params"]["conv1"]["conv"]["kernel"]
    assert w7.shape == (7, 7, 3, 64)

    y_s2d = stem.apply(v, x, train=False)
    # direct path: odd width forces the fallback conv branch
    x_odd = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    y_direct = stem.apply(v, x_odd, train=False)[:, :, : y_s2d.shape[2]]
    np.testing.assert_allclose(
        np.asarray(y_s2d[:, :, :-2]), np.asarray(y_direct[:, :, :-2]),
        rtol=1e-5, atol=1e-5,
    )

    # weight transform is the documented permutation
    w2 = _stem_kernel_s2d(w7)
    w7n = np.asarray(w7)
    for a in range(4):
        for b in range(4):
            for p in range(2):
                for q in range(2):
                    u, vv = 2 * a + p - 1, 2 * b + q - 1
                    got = np.asarray(w2[a, b, (p * 2 + q) * 3:(p * 2 + q) * 3 + 3])
                    if 0 <= u <= 6 and 0 <= vv <= 6:
                        np.testing.assert_array_equal(got, w7n[u, vv])
                    else:
                        np.testing.assert_array_equal(got, 0.0)
