"""Loss functions for MGNet-TPU (parity: reference mgnet/modeling/loss.py)."""

from mgnet_tpu.losses.segmentation import (
    cross_entropy_loss,
    deeplab_ce_loss,
    ohem_ce_loss,
    center_loss,
    offset_loss,
)
from mgnet_tpu.losses.photometric import multi_view_photometric_loss, ssim

__all__ = [
    "cross_entropy_loss",
    "deeplab_ce_loss",
    "ohem_ce_loss",
    "center_loss",
    "offset_loss",
    "multi_view_photometric_loss",
    "ssim",
]
