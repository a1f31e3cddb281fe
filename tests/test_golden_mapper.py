"""Golden data-pipeline parity: mgnet_tpu mapper chain vs the reference
transcription (tests/torch_mapper.py), per output key, on fixed PNG
fixtures with pinned augmentation parameters (VERDICT r4 next #1 — the
last parity surface without a golden test).

Ladder:
  1. per-op color jitter vs PIL ImageEnhance / HSV roundtrip, bit-exact
     (brightness/contrast/saturation LUT-or-formula vs Pillow's
     truncating f32 blend; integer L luma; hue uint8 wraparound)
  2. resize vs PIL semantics (BILINEAR antialias for images, NEAREST for
     labels) — the PIL-vs-cv2 decision: the pipeline now matches PIL
     bit-exactly; cv2 INTER_LINEAR remains only as the float fallback
  3. FULL train-mapper output dict: images + *_orig copies exact,
     targets/weights exact, reprojection mask exact, camera matrix to
     1e-5 — across downscale+crop+flip, pad-exercising, and upscale
     no-jitter cases
  4. test-mapper parity incl. the reference's unscaled-K quirk

Known, documented deviations (none load-bearing):
  * our camera_matrix is 3x3 (the 4x4's informative block) — compared
    entrywise against the reference's 4x4
  * our offset layout is [H, W, 2] (dy, dx) NHWC vs the reference's
    [2, H, W] — compared after transpose
  * sem_seg int32 vs the reference's int64 — values identical
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image, ImageEnhance

sys.path.insert(0, os.path.dirname(__file__))

from torch_mapper import (  # noqa: E402
    RefColorJitterTransform,
    RefCropTransform,
    RefHFlipTransform,
    RefPadTransform,
    RefPanopticDeepLabTargetGenerator,
    RefResizeTransform,
    RefTrainMapper,
    ref_rgb2id,
)

from mgnet_tpu.data import transforms as Tr  # noqa: E402
from mgnet_tpu.data.mapper import id2rgb  # noqa: E402

PIXEL_MEAN = (123.675, 116.280, 103.530)  # reference configs MODEL.PIXEL_MEAN


def _rand_img(rng, h=64, w=96):
    # mix noise with smooth gradients so resize antialiasing has structure
    # to disagree on
    noise = rng.randint(0, 256, (h, w, 3))
    gy, gx = np.mgrid[0:h, 0:w]
    grad = np.stack([gy * 255 // max(h - 1, 1),
                     gx * 255 // max(w - 1, 1),
                     (gy + gx) * 255 // max(h + w - 2, 1)], -1)
    return ((noise + grad) // 2).astype(np.uint8)


# ---------------------------------------------------------------------------
# 1. per-op color jitter, bit-exact
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("factor", [0.8, 0.8123, 0.95, 1.0, 1.0517, 1.2])
def test_brightness_contrast_saturation_bitexact_vs_pil(factor):
    img = _rand_img(np.random.RandomState(3))
    pim = Image.fromarray(img)
    np.testing.assert_array_equal(
        Tr._adjust_brightness(img, factor),
        np.asarray(ImageEnhance.Brightness(pim).enhance(factor)))
    np.testing.assert_array_equal(
        Tr._adjust_contrast(img, factor),
        np.asarray(ImageEnhance.Contrast(pim).enhance(factor)))
    np.testing.assert_array_equal(
        Tr._adjust_saturation(img, factor),
        np.asarray(ImageEnhance.Color(pim).enhance(factor)))


def test_brightness_lut_exact_over_every_uint8_value():
    # brightness is per-value: all 256 inputs in one image
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)[..., None].repeat(
        3, -1)
    for factor in np.linspace(0.5, 1.5, 11):
        ref = np.asarray(ImageEnhance.Brightness(
            Image.fromarray(img)).enhance(float(factor)))
        np.testing.assert_array_equal(
            Tr._adjust_brightness(img, float(factor)), ref)


def test_gray_l_matches_pil_convert_l():
    img = _rand_img(np.random.RandomState(11), 40, 50)
    np.testing.assert_array_equal(
        Tr._gray_l(img), np.asarray(Image.fromarray(img).convert("L")))


def test_hsv_conversions_bitexact_vs_pil():
    """The vectorized Pillow-replica HSV conversions (verified offline
    over ALL 2^24 inputs) stay bit-exact on a random + boundary-heavy
    sample: 1M random values plus every (x, y, 0)/(x, 0, y)/(0, x, y)
    plane edge where the integer-boundary rounding quirks live."""
    rng = np.random.RandomState(0)
    rand = rng.randint(0, 256, (1024, 1024, 3), np.uint8)
    xy = np.mgrid[0:256, 0:256].reshape(2, -1).T.astype(np.uint8)
    zeros = np.zeros((xy.shape[0], 1), np.uint8)
    planes = np.concatenate([
        np.concatenate([xy, zeros], 1), np.concatenate([xy[:, :1], zeros,
                                                        xy[:, 1:]], 1),
        np.concatenate([zeros, xy], 1)]).reshape(-1, 256, 3)
    for img in (rand, planes):
        np.testing.assert_array_equal(
            Tr._rgb2hsv_pil(img),
            np.asarray(Image.fromarray(img).convert("HSV")))
        np.testing.assert_array_equal(
            Tr._hsv2rgb_pil(img),
            np.asarray(Image.fromarray(img, "HSV").convert("RGB")))


@pytest.mark.parametrize("factor", [-0.05, -0.013, 0.0, 0.02, 0.05, 0.5])
def test_hue_bitexact_vs_torchvision_pil_path(factor):
    img = _rand_img(np.random.RandomState(5))
    ref = np.asarray(RefColorJitterTransform._adjust_hue(
        Image.fromarray(img), factor))
    np.testing.assert_array_equal(Tr._adjust_hue(img, factor), ref)


def test_full_jitter_chain_bitexact_all_orders():
    img = _rand_img(np.random.RandomState(7))
    import itertools

    for order in itertools.permutations(range(4)):
        ours = Tr.ColorJitterTransform(
            fn_order=order, brightness=0.87, contrast=1.13,
            saturation=0.91, hue=-0.031)
        ref = RefColorJitterTransform(order, 0.87, 1.13, 0.91, -0.031)
        np.testing.assert_array_equal(
            ours.apply_image(img), ref.apply_image(img), str(order))


# ---------------------------------------------------------------------------
# 2. resize parity (PIL semantics)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw,new", [
    ((128, 256), (96, 192)),    # clean downscale
    ((128, 256), (57, 114)),    # non-integer downscale
    ((100, 150), (137, 205)),   # upscale
    ((128, 256), (512, 1024)),  # 4x upscale
])
def test_resize_image_bitexact_vs_pil_bilinear(hw, new):
    img = _rand_img(np.random.RandomState(1), *hw)
    t = Tr.ResizeTransform(hw[0], hw[1], new[0], new[1])
    ref = np.asarray(Image.fromarray(img).resize(
        (new[1], new[0]), Image.BILINEAR))
    np.testing.assert_array_equal(t.apply_image(img), ref)


@pytest.mark.parametrize("hw,new", [
    ((128, 256), (96, 192)),
    ((128, 256), (57, 114)),
    ((100, 150), (137, 205)),
])
def test_resize_seg_bitexact_vs_pil_nearest(hw, new):
    # panoptic RGB label: nearest must not invent ids
    pan = np.full(hw, 7000, np.int32)
    pan[10:40, 20:70] = 26001
    rgb = id2rgb(pan)
    t = Tr.ResizeTransform(hw[0], hw[1], new[0], new[1])
    ref = np.asarray(Image.fromarray(rgb).resize(
        (new[1], new[0]), Image.NEAREST))
    ours = t.apply_segmentation(rgb)
    np.testing.assert_array_equal(ours, ref)
    assert set(np.unique(ref_rgb2id(ours))) <= {7000, 26001}


# ---------------------------------------------------------------------------
# 3. full train-mapper golden parity
# ---------------------------------------------------------------------------

H, W = 128, 256
EGO_TID, SKY_TID = 0, 11  # scene-seg contiguous ids (data/categories.py)


def _make_fixture(root: str):
    """3 frames + a panoptic label with stuff (road/sky/ego), two car
    instances (one small), a person, and a crowd segment."""
    rng = np.random.RandomState(42)
    os.makedirs(root, exist_ok=True)
    paths = {}
    for name in ("cur", "prev", "next"):
        img = _rand_img(rng, H, W)
        p = os.path.join(root, f"{name}.png")
        Image.fromarray(img).save(p)
        paths[name] = p

    pan = np.full((H, W), 7 * 1000, np.int32)        # road
    pan[:30] = 23 * 1000                             # sky band
    pan[110:, :40] = 1 * 1000                        # ego corner
    pan[40:90, 60:150] = 26 * 1000 + 1               # car 1 (big)
    pan[50:62, 180:196] = 26 * 1000 + 2              # car 2 (small)
    pan[70:100, 10:30] = 24 * 1000 + 1               # person
    pan[30:40, 200:240] = 26 * 1000 + 99             # crowd cars
    p = os.path.join(root, "pan.png")
    Image.fromarray(id2rgb(pan)).save(p)
    paths["pan"] = p

    # segments_info with CONTIGUOUS category ids (the registry converts
    # dataset ids before the mapper sees them): road->1, sky->11,
    # ego->0, person->12, car->14
    segments_info = [
        {"id": 7000, "category_id": 1, "iscrowd": 0},
        {"id": 23000, "category_id": SKY_TID, "iscrowd": 0},
        {"id": 1000, "category_id": EGO_TID, "iscrowd": 0},
        {"id": 26001, "category_id": 14, "iscrowd": 0},
        {"id": 26002, "category_id": 14, "iscrowd": 0},
        {"id": 24001, "category_id": 12, "iscrowd": 0},
        {"id": 26099, "category_id": 14, "iscrowd": 1},
    ]
    calib = {"intrinsic": {"fx": 2262.52, "fy": 2265.3,
                           "u0": 127.42, "v0": 63.81},
             "extrinsic": {"baseline": 0.222, "z": 1.22}}
    dataset_dict = {
        "file_name": paths["cur"],
        "prev_img_file_name": paths["prev"],
        "next_img_file_name": paths["next"],
        "pan_seg_file_name": paths["pan"],
        "segments_info": segments_info,
        "calibration_info": calib,
        "image_id": "fixture_000000",
        "height": H, "width": W,
    }
    return dataset_dict


# pinned augmentation draws: (resize hw, crop (x0,y0,w,h) or None,
# pad (x0,y0,x1,y1) or None, flip, jitter (order,b,c,s,h) or None)
CASES = {
    "downscale_crop_flip_jitter": dict(
        new=(96, 192), crop=(23, 0, 128, 96), pad=None, flip=True,
        jitter=((2, 0, 3, 1), 0.88, 1.12, 0.93, -0.03)),
    "pad_exercising": dict(
        new=(72, 144), crop=(9, 0, 128, 72), pad=(7, 11, 25, 13),
        flip=False, jitter=((1, 3, 0, 2), 1.07, 0.89, 1.15, 0.041)),
    "upscale_nojitter": dict(
        new=(160, 320), crop=None, pad=None, flip=False, jitter=None),
}


def _build_both_chains(case):
    new_h, new_w = case["new"]
    ours = [Tr.ResizeTransform(H, W, new_h, new_w)]
    ref_pv = np.repeat(
        np.expand_dims(np.asarray(PIXEL_MEAN), 1), 2, axis=1)
    refs = [RefResizeTransform(H, W, new_h, new_w)]
    cur_w = new_w
    if case["crop"]:
        x0, y0, cw, ch = case["crop"]
        ours.append(Tr.CropTransform(x0, y0, cw, ch))
        refs.append(RefCropTransform(x0, y0, cw, ch))
        cur_w = cw
    if case["pad"]:
        x0, y0, x1, y1 = case["pad"]
        ours.append(Tr.PadTransform(x0, y0, x1, y1, pad_value=PIXEL_MEAN,
                                    pad_value_seg=0))
        refs.append(RefPadTransform(x0, y0, x1, y1, ref_pv, 0))
        cur_w += x0 + x1
    if case["flip"]:
        ours.append(Tr.HFlipTransform(cur_w))
        refs.append(RefHFlipTransform(cur_w))
    jit_ours = jit_ref = None
    if case["jitter"]:
        order, b, c, s, h = case["jitter"]
        jit_ours = Tr.ColorJitterTransform(
            fn_order=order, brightness=b, contrast=c, saturation=s, hue=h)
        jit_ref = RefColorJitterTransform(order, b, c, s, h)
    return Tr.TransformList(ours), refs, jit_ours, jit_ref


def _run_ours(dataset_dict, tfl, jitter, tmp_path, monkeypatch):
    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data import mapper as mapper_mod
    from mgnet_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from mgnet_tpu.data.cityscapes import register_all_cityscapes_scene_seg

    for k in list(DatasetCatalog.list()):
        DatasetCatalog.remove(k)
    MetadataCatalog.clear()
    # registry only consulted for metadata; point it at a stub tree
    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import _make_mini_cityscapes

    _make_mini_cityscapes(str(tmp_path / "mini"))
    register_all_cityscapes_scene_seg(str(tmp_path / "mini"))

    cfg = get_default_config()
    cfg.INPUT.IGNORED_CATEGORIES_IN_DEPTH = ["ego vehicle", "sky"]
    cfg.INPUT.COLOR_JITTER.ENABLED = jitter is not None
    m = mapper_mod.TrainDatasetMapper(
        cfg, dataset_name="cityscapes_fine_scene_seg_train")
    m.sampler = lambda rng, shape: tfl
    if jitter is not None:
        monkeypatch.setattr(mapper_mod, "sample_color_jitter",
                            lambda *a, **k: jitter)
    return m(dataset_dict, rng=np.random.default_rng(0)), m


@pytest.mark.parametrize("case_name", sorted(CASES))
def test_train_mapper_golden_parity(case_name, tmp_path, monkeypatch):
    case = CASES[case_name]
    dataset_dict = _make_fixture(str(tmp_path / "fix"))
    tfl, refs, jit_ours, jit_ref = _build_both_chains(case)

    ours, m = _run_ours(dataset_dict, tfl, jit_ours, tmp_path, monkeypatch)
    assert m.depth_ignore_ids == [EGO_TID, SKY_TID]
    target_gen = RefPanopticDeepLabTargetGenerator(
        ignore_label=255,
        thing_ids=sorted(m.target_gen.thing_ids),
        sigma=m.cfg.INPUT.GAUSSIAN_SIGMA,
        ignore_stuff_in_offset=m.cfg.INPUT.IGNORE_STUFF_IN_OFFSET,
        small_instance_area=m.cfg.INPUT.SMALL_INSTANCE_AREA,
        small_instance_weight=m.cfg.INPUT.SMALL_INSTANCE_WEIGHT,
        ignore_crowd_in_semantic=m.cfg.INPUT.IGNORE_CROWD_IN_SEMANTIC,
    )
    ref_mapper = RefTrainMapper(refs, jit_ref, target_gen,
                                depth_ignore_ids=m.depth_ignore_ids)
    ref = ref_mapper(dict(dataset_dict))

    # images: bit-exact (ref is CHW torch, ours HWC numpy)
    for k in ("image", "image_orig", "image_prev", "image_prev_orig",
              "image_next", "image_next_orig"):
        np.testing.assert_array_equal(
            ours[k], ref[k].numpy().transpose(1, 2, 0), err_msg=k)

    # targets
    np.testing.assert_array_equal(ours["sem_seg"],
                                  ref["sem_seg"].numpy(), err_msg="sem_seg")
    np.testing.assert_allclose(ours["center"][..., 0],
                               ref["center"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        ours["offset"], ref["offset"].numpy().transpose(1, 2, 0), atol=1e-5)
    np.testing.assert_array_equal(ours["sem_seg_weights"],
                                  ref["sem_seg_weights"].numpy())
    np.testing.assert_array_equal(ours["center_weights"],
                                  ref["center_weights"].numpy()[0])
    np.testing.assert_array_equal(ours["offset_weights"],
                                  ref["offset_weights"].numpy()[0])

    # reprojection mask (ours float [H,W,1], ref bool [H,W])
    np.testing.assert_array_equal(
        ours["reprojection_mask"][..., 0].astype(bool),
        ref["reprojection_mask"].numpy())
    # the mask actually masks something in this fixture
    assert not ours["reprojection_mask"].all()

    # camera matrix: ours 3x3, ref 4x4 informative block
    refk = ref["camera_matrix"].numpy()
    np.testing.assert_allclose(ours["camera_matrix"][0, 0], refk[0, 0],
                               atol=1e-5)  # fx
    np.testing.assert_allclose(ours["camera_matrix"][1, 1], refk[1, 1],
                               atol=1e-5)  # fy
    np.testing.assert_allclose(ours["camera_matrix"][0, 2], refk[0, 2],
                               atol=1e-5)  # u0
    np.testing.assert_allclose(ours["camera_matrix"][1, 2], refk[1, 2],
                               atol=1e-5)  # v0
    np.testing.assert_allclose(ours["camera_height"],
                               ref["camera_height"].numpy()[0])


def test_sampled_chain_matches_reference_composition(tmp_path, monkeypatch):
    """The mapper's OWN sampler (real RNG draw) produces a transform list
    whose composition order and shapes match the reference recipe:
    resize -> crop -> pad-to-crop-size -> flip, with the pad restoring
    CROP.SIZE exactly when the resize undershoots it."""
    from mgnet_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 10000
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.CROP.SIZE = (96, 160)
    cfg.INPUT.CROP.RANDOM_PAD_TO_CROP_SIZE = True
    sampler = Tr.build_train_transform_sampler(cfg)
    tfl = sampler(np.random.default_rng(0), (H, W, 3))
    img = _rand_img(np.random.RandomState(0), H, W)
    out = tfl.apply_image(img)
    assert out.shape == (96, 160, 3)
    kinds = [type(t).__name__ for t in tfl]
    assert kinds[0] == "ResizeTransform"
    assert "CropTransform" in kinds and "PadTransform" in kinds
    assert kinds.index("CropTransform") < kinds.index("PadTransform")


# ---------------------------------------------------------------------------
# 4. test-mapper parity
# ---------------------------------------------------------------------------


def test_test_mapper_resize_and_unscaled_k(tmp_path):
    """Reference MGNetTestDatasetMapper resizes the image but builds the
    camera matrix from RAW calibration (dataset_mapper.py:284-294 — no
    co-augmentation at test time). We match both behaviors."""
    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.mapper import TestDatasetMapper

    d = _make_fixture(str(tmp_path / "fix"))
    cfg = get_default_config()
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 10000
    m = TestDatasetMapper(cfg)
    out = m(d)
    img = np.asarray(Image.open(d["file_name"]).convert("RGB"))
    ref_resized = np.asarray(
        Image.fromarray(img).resize((192, 96), Image.BILINEAR))
    np.testing.assert_array_equal(out["image"].astype(np.uint8), ref_resized)
    intr = d["calibration_info"]["intrinsic"]
    np.testing.assert_allclose(
        out["camera_matrix"],
        [[intr["fx"], 0, intr["u0"]], [0, intr["fy"], intr["v0"]],
         [0, 0, 1]])


def test_fixture_exercises_all_target_branches(tmp_path):
    """Meta-test: the fixture's label covers crowd, small-instance,
    multi-instance, and all three stuff ignore classes, so the golden
    parity above is not vacuous."""
    d = _make_fixture(str(tmp_path / "fix"))
    pan = ref_rgb2id(np.asarray(Image.open(d["pan_seg_file_name"])))
    ids = set(np.unique(pan))
    assert {7000, 23000, 1000, 26001, 26002, 24001, 26099} <= ids
    infos = {s["id"]: s for s in d["segments_info"]}
    assert infos[26099]["iscrowd"] == 1
    assert (pan == 26002).sum() < 4096  # below SMALL_INSTANCE_AREA default
