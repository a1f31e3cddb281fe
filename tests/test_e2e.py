"""End-to-end smoke: register a mini on-disk dataset, train a few steps
through the Trainer (threaded loader, checkpointing), then run the full
evaluator stack (SURVEY.md §4 end-to-end strategy)."""

import json
import os

import jax

import numpy as np
import pytest

from mgnet_tpu.config import get_default_config
from mgnet_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from mgnet_tpu.data.mapper import id2rgb

from test_data import _make_mini_cityscapes


def _make_mini_val(root: str):
    """Val split mirroring the train mini set."""
    from PIL import Image

    city = "valcity"
    h, w = 128, 256
    rng = np.random.RandomState(11)
    dirs = {
        "img": f"{root}/cityscapes/leftImg8bit/val/{city}",
        "seq": f"{root}/cityscapes/leftImg8bit_sequence/val/{city}",
        "cam": f"{root}/cityscapes/camera/val/{city}",
        "disp": f"{root}/cityscapes/disparity/val/{city}",
        "gt": f"{root}/cityscapes/gtFine/cityscapes_panoptic_val",
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    stem = f"{city}_000000_000010"
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    Image.fromarray(img).save(f"{dirs['img']}/{stem}_leftImg8bit.png")
    pan = np.full((h, w), 7 * 1000, np.int32)
    pan[40:80, 100:160] = 26 * 1000 + 1
    Image.fromarray(id2rgb(pan)).save(
        f"{dirs['gt']}/{stem}_gtFine_panoptic.png")
    ann = {
        "annotations": [{
            "image_id": stem,
            "file_name": f"{stem}_gtFine_panoptic.png",
            "segments_info": [
                {"id": 7000, "category_id": 7, "iscrowd": 0},
                {"id": 26001, "category_id": 26, "iscrowd": 0},
            ],
        }],
        "categories": [],
    }
    with open(f"{root}/cityscapes/gtFine/cityscapes_panoptic_val.json",
              "w") as f:
        json.dump(ann, f)
    with open(f"{dirs['cam']}/{stem}_camera.json", "w") as f:
        json.dump({
            "intrinsic": {"fx": 226.0, "fy": 226.0, "u0": 128.0, "v0": 64.0},
            "extrinsic": {"baseline": 0.222, "z": 1.22},
        }, f)
    # disparity gt: plausible positive values
    disp = (rng.uniform(500, 20000, (h, w))).astype(np.uint16)
    Image.fromarray(disp).save(f"{dirs['disp']}/{stem}_disparity.png")


@pytest.fixture
def mini_dataset(tmp_path):
    for k in list(DatasetCatalog.list()):
        DatasetCatalog.remove(k)
    MetadataCatalog.clear()
    _make_mini_cityscapes(str(tmp_path))
    _make_mini_val(str(tmp_path))
    from mgnet_tpu.data.cityscapes import register_all_cityscapes_scene_seg

    register_all_cityscapes_scene_seg(str(tmp_path))
    return tmp_path


def tiny_cfg(tmp_path):
    cfg = get_default_config()
    cfg.MODEL.COMPUTE_DTYPE = "float32"
    cfg.MODEL.SEM_SEG_HEAD.OHEM_N_MIN = 256
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 3
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.TEST.EVAL_PERIOD = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (128,)
    cfg.INPUT.MAX_SIZE_TRAIN = 256
    cfg.INPUT.CROP.SIZE = (64, 64)
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.MODEL.POST_PROCESSING.MAX_INSTANCES = 16
    cfg.TEST.EVAL_INSTANCE = True
    cfg.OUTPUT_DIR = str(tmp_path / "output")
    cfg.MESH.DATA = 1
    return cfg


def test_trainer_and_eval_end_to_end(mini_dataset):
    from mgnet_tpu.train.trainer import Trainer, evaluate_dataset

    cfg = tiny_cfg(mini_dataset)
    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    assert int(trainer.state.step) == 3
    # checkpoint written
    assert trainer.ckpt.latest_step() == 3
    # metrics logged
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))

    results = evaluate_dataset(
        cfg, trainer.model,
        trainer.state.params, trainer.state.batch_stats,
    )
    assert "panoptic_seg" in results
    assert "PQ" in results["panoptic_seg"]
    assert 0 <= results["panoptic_seg"]["PQ"] <= 100
    assert "sem_seg" in results
    assert "depth" in results
    assert np.isfinite(results["depth"]["Abs Rel"])
    assert "instances" in results
    assert "AP" in results["instances"]


class TracingTrainMapper:
    """Custom mapper for the dynamic-loading test: wraps the default
    TrainDatasetMapper and counts instantiations."""

    instances = 0

    def __new__(cls, cfg, dataset_name=None):
        from mgnet_tpu.data import TrainDatasetMapper

        cls.instances += 1
        return TrainDatasetMapper(cfg, dataset_name=dataset_name)


def test_dynamic_mapper_loading_from_config(mini_dataset):
    """INPUT.TRAIN_DATASET_MAPPER names the class the Trainer instantiates
    (reference tools/train_net.py:90-92 create_object_by_string)."""
    from mgnet_tpu.train.trainer import Trainer

    cfg = tiny_cfg(mini_dataset)
    cfg.INPUT.TRAIN_DATASET_MAPPER = "test_e2e.TracingTrainMapper"
    before = TracingTrainMapper.instances
    Trainer(cfg)
    assert TracingTrainMapper.instances == before + 1


def test_trainer_resume(mini_dataset):
    from mgnet_tpu.train.trainer import Trainer

    cfg = tiny_cfg(mini_dataset)
    trainer = Trainer(cfg)
    trainer.train()
    step_after = int(trainer.state.step)

    trainer2 = Trainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert int(trainer2.state.step) == step_after


def _fake_torchvision_r18_state_dict(seed=0):
    """Synthetic torchvision ResNet-18 state dict (correct keys/shapes)."""
    rng = np.random.RandomState(seed)

    def conv(o, i, k):
        return rng.randn(o, i, k, k).astype(np.float32) * 0.05

    sd = {"conv1.weight": conv(64, 3, 7)}
    for suf in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{suf}"] = rng.rand(64).astype(np.float32)
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
                    sd[f"{p}.{bn}.{suf}"] = rng.rand(cout).astype(np.float32)
            if cin != cout:
                sd[f"{p}.downsample.0.weight"] = conv(cout, cin, 1)
                for suf in ("weight", "bias", "running_mean",
                            "running_var"):
                    sd[f"{p}.downsample.1.{suf}"] = rng.rand(cout).astype(
                        np.float32)
    return sd


def test_trainer_grafts_imagenet_weights(mini_dataset):
    """VERDICT r1 #2: the flagship WEIGHTS path must load, with or without
    the .npz suffix, and must graft >0 leaves into the trainer state."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from convert_torchvision_weights import convert_resnet

    from mgnet_tpu.train.trainer import Trainer
    from mgnet_tpu.utils.weights import flatten_params

    sd = _fake_torchvision_r18_state_dict()
    flat = convert_resnet(sd, "backbone", 18)
    flat.update(convert_resnet(sd, "pose_net/encoder", 18,
                               expand_in_channels=9))
    npz = str(mini_dataset / "imagenet_weights.npz")
    np.savez(npz, **flat)

    cfg = tiny_cfg(mini_dataset)
    # exercise suffix resolution: configure WITHOUT the .npz suffix
    # (the reference flagship config's spelling before the r1 fix)
    cfg.MODEL.WEIGHTS = npz[:-4]
    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=False)

    got = flatten_params(jax.device_get(trainer.state.params))["model/backbone/stem/conv1/conv/kernel"]
    np.testing.assert_allclose(
        got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), atol=1e-6)
    # pose stem: tiled 3x over 9 input channels, divided by 3
    pose = flatten_params(jax.device_get(trainer.state.params))[
        "model/pose_net/encoder/stem/conv1/conv/kernel"]
    assert pose.shape[2] == 9
    np.testing.assert_allclose(
        pose[..., :3, :],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)) / 3, atol=1e-6)
    # BN running stats grafted into batch_stats
    stats = flatten_params(jax.device_get(trainer.state.batch_stats))
    np.testing.assert_allclose(
        stats["backbone/stem/conv1/abn/BatchNorm_0/mean"],
        sd["bn1.running_mean"], atol=1e-6)


def test_trainer_missing_weights_fails_loudly(mini_dataset):
    from mgnet_tpu.train.trainer import Trainer

    cfg = tiny_cfg(mini_dataset)
    cfg.MODEL.WEIGHTS = str(mini_dataset / "does_not_exist")
    trainer = Trainer(cfg)
    with pytest.raises(FileNotFoundError):
        trainer.resume_or_load(resume=False)
