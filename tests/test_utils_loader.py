"""Dynamic object loading (reference mgnet/config.py:35-37 +
tools/train_net.py:173-179 ``create_object_by_string`` parity)."""

import pytest

from mgnet_tpu.utils.loader import locate


def test_locate_resolves_default_mappers():
    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data import TestDatasetMapper, TrainDatasetMapper

    cfg = get_default_config()
    assert locate(cfg.INPUT.TRAIN_DATASET_MAPPER) is TrainDatasetMapper
    assert locate(cfg.INPUT.TEST_DATASET_MAPPER) is TestDatasetMapper


def test_locate_bad_module_fails_loudly():
    with pytest.raises(ImportError, match="no_such_pkg"):
        locate("no_such_pkg.mod.Cls")


def test_locate_bad_attr_fails_loudly():
    with pytest.raises(ImportError, match="NoSuchMapper"):
        locate("mgnet_tpu.data.NoSuchMapper")


def test_locate_not_dotted():
    with pytest.raises(ImportError, match="dotted"):
        locate("bareword")
