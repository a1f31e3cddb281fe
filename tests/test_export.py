"""AOT export round-trip: serialize the fused pipeline, reload, run."""

import jax
import jax.numpy as jnp
import numpy as np

from mgnet_tpu.config import get_default_config
from mgnet_tpu.data.catalog import Metadata
from mgnet_tpu.data.categories import (
    CITYSCAPES_SCENE_SEG_CATEGORIES,
    build_meta,
)
from mgnet_tpu.export import export_fused_inference, load_exported, save_exported
from mgnet_tpu.inference.fused import build_fused_inference, statics_from_meta
from mgnet_tpu.models.mgnet import build_model


def test_export_roundtrip(tmp_path):
    cfg = get_default_config()
    cfg.MODEL.COMPUTE_DTYPE = "float32"
    cfg.MODEL.POST_PROCESSING.MAX_INSTANCES = 16
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]

    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    params = {"model": variables["params"]}
    stats = variables.get("batch_stats", {})

    meta = Metadata(name="x").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
    )
    fused = build_fused_inference(
        model, statics_from_meta(cfg, meta),
        tuple(cfg.MODEL.PIXEL_MEAN), tuple(cfg.MODEL.PIXEL_STD),
    )

    exported, blob = export_fused_inference(
        fused, params, stats, input_shape=(1, 64, 128, 3),
    )
    assert len(blob) > 1000
    assert len(exported.mlir_module_serialized) > 100

    path = str(tmp_path / "model.jaxir")
    save_exported(path, blob)
    call = load_exported(path)

    img = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, 64, 128, 3)),
        jnp.float32,
    )
    K = jnp.asarray(np.array(
        [[[100.0, 0, 63.5], [0, 100.0, 31.5], [0, 0, 1]]], np.float32))
    ch = jnp.asarray([1.65], jnp.float32)

    out = call(img, K, ch)
    direct = fused(params, stats, img, camera_matrix=K, camera_height=ch)
    assert set(out.keys()) == set(direct.keys())
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(direct["depth"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out["panoptic"]), np.asarray(direct["panoptic"])
    )
