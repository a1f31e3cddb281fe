"""Pretrained-weight loading with matching heuristics.

Replaces the reference's DetectionCheckpointer pkl ImageNet init with
``matching_heuristics`` (reference: tools/convert-torchvision-to-mgnet.py
+ MODEL.WEIGHTS in configs): flat 'path/leaf' arrays from an .npz are
grafted into the params/batch_stats trees wherever path and shape match;
unmatched model leaves keep their random init.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

__all__ = ["load_pretrained_npz", "flatten_params", "unflatten_params"]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def flatten_params(tree: Any) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {_path_str(p): np.asarray(v) for p, v in flat}


def unflatten_params(tree: Any, flat: Dict[str, np.ndarray]) -> Any:
    def replace(path, leaf):
        key = _path_str(path)
        if key in flat and flat[key].shape == leaf.shape:
            return jax.numpy.asarray(flat[key], dtype=leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(replace, tree)


def load_pretrained_npz(npz_path: str, params: Any, batch_stats: Any
                        ) -> Tuple[Any, Any, Dict[str, int]]:
    """Graft matching arrays from the npz into params and batch_stats.

    Keys 'a/b/mean' and 'a/b/var' target batch_stats; others target params.
    Returns (params, batch_stats, stats_dict).
    """
    data = dict(np.load(npz_path))
    param_flat = flatten_params(params)
    stats_flat = flatten_params(batch_stats)

    def resolve(k, target):
        # npz keys are rooted at the model ('backbone/...'); the trainer's
        # param tree wraps the model under 'model/' (train/state.py:58) —
        # try both rootings so grafting works against either tree.
        if k in target:
            return k
        if "model/" + k in target:
            return "model/" + k
        return None

    matched, skipped = 0, 0
    new_params, new_stats = {}, {}
    for k, v in data.items():
        target = stats_flat if (k.endswith("/mean") or k.endswith("/var")) \
            else param_flat
        dest = new_stats if target is stats_flat else new_params
        rk = resolve(k, target)
        if rk is not None and target[rk].shape == v.shape:
            dest[rk] = v
            matched += 1
        else:
            skipped += 1

    params = unflatten_params(params, new_params)
    batch_stats = unflatten_params(batch_stats, new_stats)
    return params, batch_stats, {"matched": matched, "skipped": skipped}
