"""Post-processing tests: hand-built 2-instance panoptic grids and a
synthetic ground plane for exact DGC scale recovery (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from mgnet_tpu.postprocessing import (
    depth_postprocess,
    dgc_scale_factor,
    extract_instances,
    find_instance_centers,
    panoptic_fusion,
    surface_normals,
)
from mgnet_tpu.geometry import Camera


LAST_STUFF = 10  # classes 0..10 stuff, 11.. thing
NUM_CLASSES = 14
DIVISOR = 1000


def fuse(sem, center, offset, **kw):
    args = dict(
        num_classes=NUM_CLASSES,
        last_stuff_id=LAST_STUFF,
        label_divisor=DIVISOR,
        stuff_area=0,
        void_label=-1,
        threshold=0.3,
        nms_kernel=7,
        max_instances=8,
    )
    args.update(kw)
    return np.asarray(
        panoptic_fusion(jnp.asarray(sem), jnp.asarray(center),
                        jnp.asarray(offset), **args)
    )


class TestCenterNMS:
    def test_finds_peaks(self):
        h = np.zeros((32, 32), np.float32)
        h[8, 8] = 0.9
        h[20, 24] = 0.8
        h[20, 25] = 0.5  # suppressed by NMS (same 7x7 window)
        centers, valid, scores = find_instance_centers(
            jnp.asarray(h), 0.3, 7, 8
        )
        centers, valid = np.asarray(centers), np.asarray(valid)
        assert valid.sum() == 2
        got = {tuple(c) for c in centers[valid].astype(int).tolist()}
        assert got == {(8, 8), (20, 24)}

    def test_threshold(self):
        h = np.full((16, 16), 0.2, np.float32)
        _, valid, _ = find_instance_centers(jnp.asarray(h), 0.3, 7, 8)
        assert np.asarray(valid).sum() == 0


class TestPanopticFusion:
    def _two_instance_grid(self):
        """64x64: stuff class 1 everywhere; thing class 11 in two blobs."""
        sem = np.ones((64, 64), np.int32)
        sem[8:24, 8:24] = 11
        sem[40:56, 40:56] = 11
        center = np.zeros((64, 64), np.float32)
        center[16, 16] = 0.9
        center[48, 48] = 0.95
        offset = np.zeros((64, 64, 2), np.float32)
        # offsets point at the correct centers
        ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
        for (cy, cx), sl in [((16, 16), (slice(8, 24), slice(8, 24))),
                             ((48, 48), (slice(40, 56), slice(40, 56)))]:
            offset[..., 0][sl] = cy - ys[sl]
            offset[..., 1][sl] = cx - xs[sl]
        return sem, center, offset

    def test_two_instances(self):
        sem, center, offset = self._two_instance_grid()
        pan = fuse(sem, center, offset)
        # stuff: class 1 * divisor
        assert (pan[0, 0] == 1 * DIVISOR)
        ids_a = np.unique(pan[8:24, 8:24])
        ids_b = np.unique(pan[40:56, 40:56])
        assert len(ids_a) == 1 and len(ids_b) == 1
        assert ids_a[0] != ids_b[0]
        # both are class 11 with nonzero instance ids
        assert ids_a[0] // DIVISOR == 11 and ids_b[0] // DIVISOR == 11
        assert ids_a[0] % DIVISOR > 0 and ids_b[0] % DIVISOR > 0

    def test_majority_vote_overrides_pixel_class(self):
        sem, center, offset = self._two_instance_grid()
        sem[8:24, 8:24] = 12
        sem[8:10, 8:24] = 13  # minority class inside blob A
        pan = fuse(sem, center, offset)
        ids_a = np.unique(pan[8:24, 8:24])
        assert len(ids_a) == 1 and ids_a[0] // DIVISOR == 12

    def test_no_centers_keeps_semantic(self):
        sem, _, offset = self._two_instance_grid()
        center = np.zeros((64, 64), np.float32)
        pan = fuse(sem, center, offset)
        # thing pixels fall back to class * divisor with instance 0
        assert (pan[8:24, 8:24] == 11 * DIVISOR).all()
        assert (pan[0, 0] == 1 * DIVISOR)

    def test_stuff_area_filter(self):
        sem, center, offset = self._two_instance_grid()
        sem[0:2, 0:2] = 2  # tiny stuff region (4 px)
        pan = fuse(sem, center, offset, stuff_area=16)
        assert (pan[0:2, 0:2] == -1).all()

    def test_full_res_compiles(self):
        """Smoke: fusion jits and runs at moderate resolution."""
        sem = np.ones((256, 512), np.int32)
        center = np.zeros((256, 512), np.float32)
        offset = np.zeros((256, 512, 2), np.float32)
        pan = fuse(sem, center, offset)
        assert pan.shape == (256, 512)


class TestDGC:
    def _ground_plane_setup(self, cam_height=1.65, scale=2.0):
        """Synthetic flat ground at y = cam_height below camera (+y down)."""
        h, w = 64, 96
        K = np.array([[60.0, 0, (w - 1) / 2], [0, 60.0, (h - 1) / 2],
                      [0, 0, 1]], np.float32)[None]
        cam = Camera(K=jnp.asarray(K))
        ys = np.arange(h)
        # rays: y_dir = (v - cy) / fy; depth so that point_y == cam_height/scale
        ydir = (ys - (h - 1) / 2) / 60.0
        ground_rows = ydir > 0.2  # only well-below-horizon rows
        depth = np.full((1, h, w, 1), 10.0, np.float32)
        for i, v in enumerate(ys):
            if ground_rows[i]:
                depth[0, i, :, 0] = (cam_height / scale) / ydir[i]
        points = np.asarray(cam.reconstruct(jnp.asarray(depth), frame="c"))
        mask = np.broadcast_to(ground_rows[None, :, None], (1, h, w)).copy()
        return points, mask, K, depth

    def test_scale_recovery_exact(self):
        """Plane at height/2 -> scale factor == 2."""
        points, mask, _, _ = self._ground_plane_setup(scale=2.0)
        s = np.asarray(dgc_scale_factor(
            jnp.asarray(points), jnp.asarray([1.65], np.float32),
            jnp.asarray(mask)))
        np.testing.assert_allclose(s, 2.0, rtol=1e-2)

    def test_geometric_ground_mask_path(self):
        points, _, _, _ = self._ground_plane_setup(scale=1.0)
        s = np.asarray(dgc_scale_factor(
            jnp.asarray(points), jnp.asarray([1.65], np.float32), None))
        np.testing.assert_allclose(s, 1.0, rtol=5e-2)

    def test_surface_normals_flat_plane(self):
        points, mask, _, _ = self._ground_plane_setup(scale=1.0)
        n = np.asarray(surface_normals(jnp.asarray(points)))
        inner = mask[0, 2:-2, 2:-2]
        ny = np.abs(n[0, 2:-2, 2:-2, 1][inner])
        assert (ny > 0.99).mean() > 0.9

    def test_depth_postprocess_filter(self):
        points, mask, K, depth = self._ground_plane_setup(scale=1.0)
        pan = np.zeros((1, 64, 96), np.int32)
        pan[0, :8] = 5 * DIVISOR  # "sky"
        road = 3 * DIVISOR
        pan[0, np.asarray(mask[0])] = road
        d, pts = depth_postprocess(
            jnp.asarray(depth), jnp.asarray(K),
            jnp.asarray([1.65], np.float32), jnp.asarray(pan),
            use_dgc_scaling=True, road_class_id=road,
            filter_class_ids=(5 * DIVISOR,),
        )
        d = np.asarray(d)
        assert (d[0, :8] == 0).all()
        assert np.isnan(np.asarray(pts)[0, :8]).all()
        assert (d[0, np.asarray(mask[0])] > 0).all()


def test_extract_instances():
    pan = np.full((32, 32), 1 * DIVISOR, np.int64)
    pan[4:13, 4:13] = 11 * DIVISOR + 1  # centroid exactly at (8, 8)
    pan[20:29, 18:29] = 11 * DIVISOR + 2
    probs = np.full((32, 32, NUM_CLASSES), 1.0 / NUM_CLASSES, np.float32)
    probs[..., 11] = 0.8
    center = np.zeros((32, 32), np.float32)
    center[8, 8] = 0.9
    center[24, 23] = 0.7
    inst = extract_instances(probs, center, pan, thing_ids=[11, 12, 13])
    assert len(inst) == 2
    assert {i["pred_class"] for i in inst} == {11}
    a = [i for i in inst if i["mask"][8, 8]][0]
    np.testing.assert_allclose(a["score"], 0.8 * 0.9, rtol=1e-5)
    assert a["bbox"] == (4, 4, 12, 12)
