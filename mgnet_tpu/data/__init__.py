"""Data pipeline (parity: reference mgnet/data/)."""

from mgnet_tpu.data.catalog import DatasetCatalog, Metadata, MetadataCatalog
from mgnet_tpu.data.categories import (
    CITYSCAPES_CATEGORIES,
    CITYSCAPES_SCENE_SEG_CATEGORIES,
    build_meta,
)
from mgnet_tpu.data.cityscapes import register_all_cityscapes_scene_seg
from mgnet_tpu.data.kitti import register_all_kitti_eigen_scene_seg
from mgnet_tpu.data.loader import TrainLoader, collate_batch, test_loader
from mgnet_tpu.data.mapper import (
    TestDatasetMapper,
    TrainDatasetMapper,
    id2rgb,
    read_image,
    rgb2id,
)
from mgnet_tpu.data.target_generator import PanopticTargetGenerator

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "Metadata",
    "CITYSCAPES_CATEGORIES",
    "CITYSCAPES_SCENE_SEG_CATEGORIES",
    "build_meta",
    "register_all_cityscapes_scene_seg",
    "register_all_kitti_eigen_scene_seg",
    "TrainLoader",
    "test_loader",
    "collate_batch",
    "TrainDatasetMapper",
    "TestDatasetMapper",
    "PanopticTargetGenerator",
    "rgb2id",
    "id2rgb",
    "read_image",
]
