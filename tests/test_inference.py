"""Fused inference pipeline tests: shapes, panoptic/depth consistency,
TTA averaging, weight import round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from mgnet_tpu.config import get_default_config
from mgnet_tpu.data.catalog import Metadata
from mgnet_tpu.data.categories import (
    CITYSCAPES_SCENE_SEG_CATEGORIES,
    build_meta,
)
from mgnet_tpu.inference.fused import (
    build_fused_inference,
    statics_from_meta,
)
from mgnet_tpu.inference.tta import multi_scale_flip_inference
from mgnet_tpu.models.mgnet import build_model


def small_cfg():
    cfg = get_default_config()
    cfg.MODEL.COMPUTE_DTYPE = "float32"
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
    cfg.MODEL.POST_PROCESSING.MAX_INSTANCES = 32
    return cfg


def init_model(cfg, shape=(1, 64, 128, 3)):
    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32), train=False
    )
    return model, {"model": variables["params"]}, variables.get(
        "batch_stats", {}
    )


class TestFused:
    def test_output_contract(self):
        cfg = small_cfg()
        model, params, stats = init_model(cfg)
        meta = Metadata(name="t").set(
            **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
        )
        fused = jax.jit(build_fused_inference(
            model, statics_from_meta(cfg, meta),
            tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD),
        ))
        img = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (1, 64, 128, 3)),
            jnp.float32,
        )
        K = jnp.asarray(np.array(
            [[[100.0, 0, 63.5], [0, 100.0, 31.5], [0, 0, 1]]], np.float32
        ))
        out = fused(params, stats, img, camera_matrix=K,
                    camera_height=jnp.asarray([1.65], jnp.float32))
        assert out["sem_seg"].shape == (1, 64, 128)
        assert out["panoptic"].shape == (1, 64, 128)
        assert out["depth"].shape == (1, 64, 128)
        assert out["points"].shape == (1, 64, 128, 3)
        # panoptic ids consistent with semantic classes where not void
        pan = np.asarray(out["panoptic"][0])
        valid = pan >= 0
        assert valid.any()
        classes = np.unique(pan[valid] // 1000)
        assert (classes < 20).all()
        # depth positive or zero (filtered sky/ego)
        d = np.asarray(out["depth"])
        assert (d >= 0).all()

    def test_panoptic_matches_semantic_argmax_for_stuff(self):
        cfg = small_cfg()
        model, params, stats = init_model(cfg)
        meta = Metadata(name="t").set(
            **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
        )
        fused = jax.jit(build_fused_inference(
            model, statics_from_meta(cfg, meta),
            tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD),
            with_depth=False,
        ))
        img = jnp.zeros((1, 64, 128, 3), jnp.float32)
        out = fused(params, stats, img)
        pan = np.asarray(out["panoptic"][0])
        sem = np.asarray(out["sem_seg"][0])
        stuff = (sem <= 11) & (pan >= 0)
        np.testing.assert_array_equal(pan[stuff] // 1000, sem[stuff])


class TestTTA:
    def test_identity_on_symmetric_model(self):
        """TTA output shapes and finiteness; averaging keeps probs."""
        cfg = small_cfg()
        model, params, stats = init_model(cfg)
        variables = {"params": params["model"], "batch_stats": stats}
        x = jnp.asarray(
            np.random.RandomState(1).rand(1, 64, 128, 3), jnp.float32
        )
        out = multi_scale_flip_inference(
            model, variables, x, scales=(0.5, 1.0), flip=True
        )
        assert out["sem_seg"].shape == (1, 64, 128, 20)
        probs = np.asarray(out["sem_seg"]).sum(-1)
        np.testing.assert_allclose(probs, 1.0, atol=1e-4)
        assert np.isfinite(np.asarray(out["depth"])).all()
        assert out["offset"].shape == (1, 64, 128, 2)

    def test_flip_batching_matches_sequential(self):
        """The [2B]-batched flip pair must equal the per-pass sequential
        order of the reference (mg_net.py:461-520): separate forwards for
        the flipped/unflipped inputs, upsample, softmax, unflip, average."""
        from mgnet_tpu.geometry.depth import inv2depth
        from mgnet_tpu.geometry.image import interpolate_bilinear

        cfg = small_cfg()
        model, params, stats = init_model(cfg)
        variables = {"params": params["model"], "batch_stats": stats}
        x = jnp.asarray(
            np.random.RandomState(3).rand(2, 64, 128, 3), jnp.float32
        )
        scales = (0.5, 1.0)
        got = multi_scale_flip_inference(
            model, variables, x, scales=scales, flip=True
        )

        b, h, w = 2, 64, 128
        stride = model.common_stride
        avg = {}
        for scale in scales:
            sh, sw = int(h * scale), int(w * scale)
            xs = interpolate_bilinear(x, (sh, sw))
            for flipped in (False, True):
                xi = xs[:, :, ::-1, :] if flipped else xs
                out = model.apply(variables, xi, train=False,
                                  upsample=False)
                r = interpolate_bilinear(
                    out["sem_seg"].astype(jnp.float32), (h, w))
                r = jax.nn.softmax(r, axis=-1)
                c = interpolate_bilinear(
                    out["center"].astype(jnp.float32), (h, w))
                o = interpolate_bilinear(
                    out["offset"].astype(jnp.float32), (h, w)
                ) * (stride / scale)
                inv = 1.0 / jnp.clip(
                    out["depth"].astype(jnp.float32), min=1e-6)
                d = inv2depth(interpolate_bilinear(inv, (h, w)))
                if flipped:
                    r, c, d = (t[:, :, ::-1] for t in (r, c, d))
                    o = o[:, :, ::-1].at[..., 1].multiply(-1.0)
                for k, v in dict(sem_seg=r, center=c, offset=o,
                                 depth=d).items():
                    avg[k] = v if k not in avg else avg[k] + v
        n = len(scales) * 2
        for k in ("sem_seg", "center", "offset", "depth"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(avg[k] / n),
                atol=1e-5, rtol=1e-5,
                err_msg=f"TTA flip batching changed {k}")


class TestWeightImport:
    def test_torchvision_conversion_roundtrip(self, tmp_path):
        """Synthetic torchvision-style state dict -> npz -> grafted."""
        import sys
        sys.path.insert(0, "tools")
        from convert_torchvision_weights import convert_resnet

        rng = np.random.RandomState(0)

        def conv(o, i, k):
            return rng.randn(o, i, k, k).astype(np.float32)

        sd = {"conv1.weight": conv(64, 3, 7),
              "bn1.weight": rng.rand(64).astype(np.float32),
              "bn1.bias": rng.rand(64).astype(np.float32),
              "bn1.running_mean": rng.rand(64).astype(np.float32),
              "bn1.running_var": rng.rand(64).astype(np.float32)}
        chans = [64, 64, 128, 256, 512]
        for st in range(4):
            for b in range(2):
                cin = chans[st] if b == 0 else chans[st + 1]
                cout = chans[st + 1]
                p = f"layer{st + 1}.{b}"
                sd[f"{p}.conv1.weight"] = conv(cout, cin, 3)
                sd[f"{p}.conv2.weight"] = conv(cout, cout, 3)
                for bn in ("bn1", "bn2"):
                    for suf in ("weight", "bias", "running_mean",
                                "running_var"):
                        sd[f"{p}.{bn}.{suf}"] = rng.rand(cout).astype(
                            np.float32)
                if cin != cout:
                    sd[f"{p}.downsample.0.weight"] = conv(cout, cin, 1)
                    for suf in ("weight", "bias", "running_mean",
                                "running_var"):
                        sd[f"{p}.downsample.1.{suf}"] = rng.rand(
                            cout).astype(np.float32)

        flat = convert_resnet(sd, "backbone", 18)
        npz = str(tmp_path / "w.npz")
        np.savez(npz, **flat)

        from mgnet_tpu.models.resnet import ResNetABN
        from mgnet_tpu.utils.weights import load_pretrained_npz

        model = ResNetABN(depth=18)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        params = {"backbone": v["params"]}
        stats = {"backbone": v["batch_stats"]}
        new_p, new_s, info = load_pretrained_npz(npz, params, stats)
        assert info["matched"] > 50
        assert info["skipped"] == 0
        # stem kernel grafted in HWIO
        got = np.asarray(new_p["backbone"]["stem"]["conv1"]["conv"]["kernel"])
        np.testing.assert_allclose(
            got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), atol=1e-6
        )


class TestPredictor:
    def test_predictor_basic_and_tta(self):
        from mgnet_tpu.inference.predictor import Predictor

        cfg = small_cfg()
        cfg.INPUT.MIN_SIZE_TEST = 64
        cfg.INPUT.MAX_SIZE_TEST = 128
        img = np.random.RandomState(0).randint(
            0, 255, (64, 128, 3), np.uint8
        )
        calib = {"intrinsic": {"fx": 100.0, "fy": 100.0,
                               "u0": 63.5, "v0": 31.5},
                 "extrinsic": {"z": 1.65}}
        p = Predictor(cfg, calibration_info=calib, dataset_name="ptest")
        out = p(img)
        assert out["panoptic"].shape == (64, 128)
        assert out["depth"].shape == (64, 128)

        cfg2 = small_cfg()
        cfg2.INPUT.MIN_SIZE_TEST = 64
        cfg2.INPUT.MAX_SIZE_TEST = 128
        cfg2.TEST.MSC_FLIP_EVAL = True
        p2 = Predictor(cfg2, calibration_info=calib,
                       dataset_name="ptest2")
        out2 = p2(img)
        assert out2["panoptic"].shape == (64, 128)
        assert out2["depth"].shape == (64, 128)

    def test_predict_batch_outputs_filter(self):
        """outputs=('panoptic',) compiles a filtered executable whose
        results match the full dict (pseudo-label D2H compaction)."""
        from mgnet_tpu.inference.predictor import Predictor

        cfg = small_cfg()
        cfg.INPUT.MIN_SIZE_TEST = 64
        cfg.INPUT.MAX_SIZE_TEST = 128
        p = Predictor(cfg, dataset_name="ptest3")
        imgs = np.random.RandomState(1).randint(
            0, 255, (2, 64, 128, 3), np.uint8
        ).astype(np.float32)
        full = p.predict_batch(imgs)
        only = p.predict_batch(imgs, outputs=("panoptic",))
        assert set(only) == {"panoptic"}
        np.testing.assert_array_equal(only["panoptic"], full["panoptic"])
