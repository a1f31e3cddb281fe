"""Data pipeline tests: transforms, target generator, config system,
and an end-to-end mapper run over a synthetic on-disk mini-dataset."""

import json
import os

import numpy as np
import pytest

from mgnet_tpu.config import get_default_config, load_config
from mgnet_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from mgnet_tpu.data.loader import collate_batch, pad_to_divisible
from mgnet_tpu.data.mapper import TrainDatasetMapper, id2rgb, rgb2id
from mgnet_tpu.data.target_generator import PanopticTargetGenerator
from mgnet_tpu.data.transforms import (
    ColorJitterTransform,
    CropTransform,
    HFlipTransform,
    PadTransform,
    ResizeTransform,
    TransformList,
    sample_color_jitter,
)


class TestTransforms:
    def test_resize_coords_pixel_center(self):
        t = ResizeTransform(100, 200, 50, 100)
        c = t.apply_coords(np.array([[99.5, 49.5]]))
        # (99.5 + .5) * .5 - .5 = 49.5
        np.testing.assert_allclose(c, [[49.5, 24.5]])
        f = t.apply_focal(np.array([[100.0, 100.0]]))
        np.testing.assert_allclose(f, [[50.0, 50.0]])

    def test_crop_and_pad_coords(self):
        crop = CropTransform(10, 20, 50, 40)
        c = crop.apply_coords(np.array([[30.0, 30.0]]))
        np.testing.assert_allclose(c, [[20.0, 10.0]])
        pad = PadTransform(5, 3, 0, 0)
        c2 = pad.apply_coords(c)
        np.testing.assert_allclose(c2, [[25.0, 13.0]])

    def test_flip_coords(self):
        t = HFlipTransform(100)
        c = t.apply_coords(np.array([[30.0, 7.0]]))
        np.testing.assert_allclose(c, [[70.0, 7.0]])

    def test_pad_reprojection_mask(self):
        pad = PadTransform(2, 1, 3, 4, pad_value_seg=0)
        mask = np.ones((16, 16), bool)  # already padded-size mask
        out = pad.apply_reprojection_mask(mask)
        assert not out[0].any()            # top y0=1 rows zeroed
        assert not out[:, :2].any()        # left x0=2 cols zeroed
        assert not out[-4:].any()          # bottom y1=4
        assert not out[:, -3:].any()       # right x1=3
        assert out[1:-4, 2:-3].all()

    def test_pad_image_reference_per_axis_quirk(self):
        # The reference's np.pad constant is one value PER AXIS (see
        # PadTransform.apply_image docstring): y-borders fill with
        # pad_value[0] in every channel, x-borders with pad_value[1],
        # and x overwrites the corners.
        pad = PadTransform(1, 1, 1, 1, pad_value=(10.0, 20.0, 30.0))
        img = np.zeros((4, 4, 3), np.float32)
        out = pad.apply_image(img)
        assert out.shape == (6, 6, 3)
        np.testing.assert_allclose(out[0, 2], [10, 10, 10])   # top row
        np.testing.assert_allclose(out[-1, 2], [10, 10, 10])  # bottom row
        np.testing.assert_allclose(out[2, 0], [20, 20, 20])   # left col
        np.testing.assert_allclose(out[0, 0], [20, 20, 20])   # corner = x

    def test_color_jitter_deterministic_reapply(self):
        rng = np.random.default_rng(0)
        t = sample_color_jitter(rng)
        img = np.random.RandomState(0).randint(
            0, 255, (16, 16, 3), np.uint8
        )
        a, b = t.apply_image(img), t.apply_image(img)
        np.testing.assert_array_equal(a, b)

    def test_color_jitter_brightness(self):
        t = ColorJitterTransform(fn_order=(0,), brightness=0.5)
        img = np.full((4, 4, 3), 100, np.uint8)
        out = t.apply_image(img)
        np.testing.assert_array_equal(out, 50)


class TestTargetGenerator:
    def _gen(self, **kw):
        args = dict(ignore_label=255, thing_ids=[11, 12, 13], sigma=8,
                    ignore_stuff_in_offset=True, small_instance_area=100,
                    small_instance_weight=3)
        args.update(kw)
        return PanopticTargetGenerator(**args)

    def test_center_peak_and_offsets(self):
        gen = self._gen()
        pan = np.full((64, 64), 1000, np.int32)  # stuff class 1
        pan[16:32, 16:32] = 11 * 1000 + 1
        t = gen(pan, [
            dict(id=1000, category_id=1, iscrowd=0),
            dict(id=11001, category_id=11, iscrowd=0),
        ])
        # centroid at (23.5, 23.5) -> peak at rounded (24, 24) region
        cy, cx = np.unravel_index(np.argmax(t["center"]), t["center"].shape)
        assert abs(cy - 23.5) <= 1 and abs(cx - 23.5) <= 1
        assert t["center"].max() > 0.99
        # offsets point at centroid
        np.testing.assert_allclose(t["offset"][16, 16], [7.5, 7.5])
        np.testing.assert_allclose(t["offset"][31, 31], [-7.5, -7.5])
        # stuff pixel has no offset supervision
        assert t["offset_weights"][0, 0] == 0
        assert t["offset_weights"][20, 20] == 1

    def test_small_instance_weight(self):
        gen = self._gen(small_instance_area=10000)
        pan = np.full((64, 64), 1000, np.int32)
        pan[0:8, 0:8] = 12 * 1000 + 1
        t = gen(pan, [
            dict(id=1000, category_id=1, iscrowd=0),
            dict(id=12001, category_id=12, iscrowd=0),
        ])
        assert (t["sem_seg_weights"][0:8, 0:8] == 3).all()
        assert t["sem_seg_weights"][30, 30] == 1

    def test_crowd_excluded(self):
        gen = self._gen()
        pan = np.full((32, 32), 11 * 1000 + 1, np.int32)
        t = gen(pan, [dict(id=11001, category_id=11, iscrowd=1)])
        assert t["center"].max() == 0
        assert (t["offset_weights"] == 0).all()
        assert (t["sem_seg"] == 11).all()  # still in semantic

    def test_center_weight_stuff_trick(self):
        gen = self._gen()
        pan = np.full((32, 32), 1000, np.int32)
        t = gen(pan, [dict(id=1000, category_id=1, iscrowd=0)])
        # stuff pixels (sem < first thing id) get center weight 1
        assert (t["center_weights"] == 1).all()


class TestConfig:
    def test_defaults_and_override(self):
        cfg = get_default_config()
        assert cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES == 20
        cfg.merge_from_list(["SOLVER.BASE_LR", "0.01",
                             "WITH_DEPTH", "False"])
        assert cfg.SOLVER.BASE_LR == 0.01
        assert cfg.WITH_DEPTH is False

    def test_freeze(self):
        cfg = get_default_config().freeze()
        with pytest.raises(AttributeError):
            cfg.WITH_DEPTH = False
        cfg.defrost()
        cfg.WITH_DEPTH = False

    def test_unknown_key_rejected(self):
        cfg = get_default_config()
        with pytest.raises(KeyError):
            cfg.merge_from_list(["NO.SUCH.KEY", "1"])

    def test_yaml_base_inheritance(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("SOLVER:\n  BASE_LR: 0.5\nWITH_DEPTH: false\n")
        child = tmp_path / "child.yaml"
        child.write_text(
            f"_BASE_: ./base.yaml\nSOLVER:\n  MAX_ITER: 7\n"
        )
        cfg = load_config(str(child))
        assert cfg.SOLVER.BASE_LR == 0.5
        assert cfg.SOLVER.MAX_ITER == 7
        assert cfg.WITH_DEPTH is False


class TestCollate:
    def test_pad_to_divisible(self):
        x = np.ones((30, 50, 3))
        out = pad_to_divisible(x, 32)
        assert out.shape == (32, 64, 3)
        assert out[31, 0, 0] == 0

    def test_collate_sem_seg_pad_value(self):
        a = {"sem_seg": np.zeros((30, 30), np.int32)}
        b = {"sem_seg": np.zeros((30, 30), np.int32)}
        batch = collate_batch([a, b], divisibility=32)
        assert batch["sem_seg"].shape == (2, 32, 32)
        assert (batch["sem_seg"][:, 31, :] == 255).all()


def _make_mini_cityscapes(root: str):
    """Synthetic cityscapes-like tree: 1 city, 3 sequence frames."""
    from PIL import Image

    city = "testcity"
    h, w = 128, 256
    rng = np.random.RandomState(7)

    dirs = {
        "img": f"{root}/cityscapes/leftImg8bit/train/{city}",
        "seq": f"{root}/cityscapes/leftImg8bit_sequence/train/{city}",
        "cam": f"{root}/cityscapes/camera/train/{city}",
        "disp": f"{root}/cityscapes/disparity/train/{city}",
        "gt": f"{root}/cityscapes/gtFine/cityscapes_panoptic_train",
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    stem = f"{city}_000000_000010"
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    Image.fromarray(img).save(f"{dirs['img']}/{stem}_leftImg8bit.png")
    for i in (9, 10, 11):
        frame = f"{city}_000000_{i:06d}"
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)
        ).save(f"{dirs['seq']}/{frame}_leftImg8bit.png")

    # panoptic label: stuff road (id 7 -> trainId 1) + one car instance
    pan = np.full((h, w), 7 * 1000, np.int32)
    pan[40:80, 100:160] = 26 * 1000 + 1
    Image.fromarray(id2rgb(pan)).save(
        f"{dirs['gt']}/{stem}_gtFine_panoptic.png"
    )
    ann = {
        "annotations": [{
            "image_id": stem,
            "file_name": f"{stem}_gtFine_panoptic.png",
            "segments_info": [
                {"id": 7 * 1000, "category_id": 7, "iscrowd": 0,
                 "area": int((pan == 7000).sum())},
                {"id": 26 * 1000 + 1, "category_id": 26, "iscrowd": 0,
                 "area": int((pan == 26001).sum())},
            ],
        }],
        "categories": [],
    }
    with open(f"{root}/cityscapes/gtFine/cityscapes_panoptic_train.json",
              "w") as f:
        json.dump(ann, f)

    cam = {
        "intrinsic": {"fx": 2262.52, "fy": 2265.3, "u0": 128.0, "v0": 64.0},
        "extrinsic": {"baseline": 0.222, "z": 1.22},
    }
    with open(f"{dirs['cam']}/{stem}_camera.json", "w") as f:
        json.dump(cam, f)
    disp = rng.randint(1, 30000, (h, w)).astype(np.uint16)
    Image.fromarray(disp).save(f"{dirs['disp']}/{stem}_disparity.png")


class TestMapperEndToEnd:
    def test_cityscapes_register_and_map(self, tmp_path):
        from mgnet_tpu.data.cityscapes import (
            register_all_cityscapes_scene_seg,
        )

        _make_mini_cityscapes(str(tmp_path))
        # isolate catalog state
        for k in list(DatasetCatalog.list()):
            DatasetCatalog.remove(k)
        MetadataCatalog.clear()
        register_all_cityscapes_scene_seg(str(tmp_path))

        dicts = DatasetCatalog.get("cityscapes_fine_scene_seg_train")
        assert len(dicts) == 1
        d = dicts[0]
        assert os.path.exists(d["file_name"])
        assert os.path.exists(d["prev_img_file_name"])
        assert os.path.exists(d["next_img_file_name"])
        # trainId conversion: id 7 (road) -> 1, id 26 (car) -> 14
        cats = {s["category_id"] for s in d["segments_info"]}
        assert cats == {1, 14}

        cfg = get_default_config()
        cfg.INPUT.MIN_SIZE_TRAIN = (128,)
        cfg.INPUT.MAX_SIZE_TRAIN = 256
        cfg.INPUT.CROP.SIZE = (128, 128)
        cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
        mapper = TrainDatasetMapper(
            cfg, dataset_name="cityscapes_fine_scene_seg_train"
        )
        s = mapper(d, rng=np.random.default_rng(0))
        assert s["image"].shape == (128, 128, 3)
        assert s["sem_seg"].shape == (128, 128)
        assert s["center"].shape == (128, 128, 1)
        assert s["offset"].shape == (128, 128, 2)
        assert s["image_prev"].shape == (128, 128, 3)
        assert s["reprojection_mask"].shape == (128, 128, 1)
        assert s["camera_matrix"].shape == (3, 3)
        assert np.isclose(s["camera_height"], 1.22)
        # only sem classes present are 1 (road), 14 (car), 255 (pad->0 void)
        present = set(np.unique(s["sem_seg"]).tolist())
        assert present <= {0, 1, 14, 255}

        batch = collate_batch([s, s])
        assert batch["image"].shape == (2, 128, 128, 3)

    def test_rgb2id_roundtrip(self):
        ids = np.array([[0, 1000, 26001, 255255]], np.int64)
        np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)

    def test_decode_cache_mapper_parity(self, tmp_path):
        """DECODE_CACHE_DIR changes where bytes come from, not a single
        bit of the mapper output (miss epoch AND warm-hit epoch)."""
        from mgnet_tpu.data.cityscapes import (
            register_all_cityscapes_scene_seg,
        )

        _make_mini_cityscapes(str(tmp_path / "ds"))
        for k in list(DatasetCatalog.list()):
            DatasetCatalog.remove(k)
        MetadataCatalog.clear()
        register_all_cityscapes_scene_seg(str(tmp_path / "ds"))
        d = DatasetCatalog.get("cityscapes_fine_scene_seg_train")[0]

        def make_cfg(cache_dir=""):
            cfg = get_default_config()
            cfg.INPUT.MIN_SIZE_TRAIN = (128,)
            cfg.INPUT.MAX_SIZE_TRAIN = 256
            cfg.INPUT.CROP.SIZE = (128, 128)
            cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
            cfg.DATALOADER.DECODE_CACHE_DIR = cache_dir
            return cfg

        name = "cityscapes_fine_scene_seg_train"
        ref = TrainDatasetMapper(make_cfg(), dataset_name=name)(
            d, rng=np.random.default_rng(3))
        cached = TrainDatasetMapper(
            make_cfg(str(tmp_path / "dc")), dataset_name=name)
        miss = cached(d, rng=np.random.default_rng(3))   # populates cache
        hit = cached(d, rng=np.random.default_rng(3))    # mmap reads
        assert len(os.listdir(str(tmp_path / "dc"))) == 4  # 4 distinct PNGs
        for out in (miss, hit):
            assert set(out) == set(ref)
            for k in ref:
                if k == "image_id":
                    assert out[k] == ref[k]
                else:
                    np.testing.assert_array_equal(
                        np.asarray(out[k]), np.asarray(ref[k]), err_msg=k)

    def test_decode_cache_invalidation(self, tmp_path):
        from PIL import Image

        from mgnet_tpu.data.decode_cache import DecodeCache

        p = str(tmp_path / "img.png")
        a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        Image.fromarray(a).save(p)
        cache = DecodeCache(str(tmp_path / "dc"))
        np.testing.assert_array_equal(np.asarray(cache.get(p)), a)
        # rewrite with different content + mtime -> new entry, not stale
        b = a[::-1].copy()
        Image.fromarray(b).save(p)
        os.utime(p, ns=(1, 1))
        np.testing.assert_array_equal(np.asarray(cache.get(p)), b)
        # returned hit views are read-only
        arr = cache.get(p)
        with pytest.raises(ValueError):
            arr[0, 0, 0] = 1


class TestLoaderDeterminism:
    def test_same_seed_same_batches(self, tmp_path):
        from mgnet_tpu.data.cityscapes import (
            register_all_cityscapes_scene_seg,
        )
        from mgnet_tpu.data.loader import TrainLoader

        _make_mini_cityscapes(str(tmp_path))
        for k in list(DatasetCatalog.list()):
            DatasetCatalog.remove(k)
        MetadataCatalog.clear()
        register_all_cityscapes_scene_seg(str(tmp_path))
        dicts = DatasetCatalog.get("cityscapes_fine_scene_seg_train")

        cfg = get_default_config()
        cfg.INPUT.MIN_SIZE_TRAIN = (128,)
        cfg.INPUT.MAX_SIZE_TRAIN = 256
        cfg.INPUT.CROP.SIZE = (64, 64)
        cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
        mapper = TrainDatasetMapper(
            cfg, dataset_name="cityscapes_fine_scene_seg_train"
        )

        def first_batches(n=2):
            loader = TrainLoader(
                dicts, mapper, batch_size=2, seed=7, num_workers=2,
                prefetch=2,
            )
            it = iter(loader)
            out = [next(it) for _ in range(n)]
            loader.close()
            return out

        a = first_batches()
        b = first_batches()
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(ba["image"], bb["image"])
            np.testing.assert_array_equal(ba["sem_seg"], bb["sem_seg"])
            np.testing.assert_array_equal(
                ba["camera_matrix"], bb["camera_matrix"]
            )
