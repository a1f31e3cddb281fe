from mgnet_tpu.solver.build import (
    build_optimizer,
    warmup_poly_schedule,
    lr_multiplier_tree,
    weight_decay_mask_trees,
)

__all__ = [
    "build_optimizer",
    "warmup_poly_schedule",
    "lr_multiplier_tree",
    "weight_decay_mask_trees",
]
