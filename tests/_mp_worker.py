"""Worker process for the 2-process multihost test (test_multiprocess.py).

Each rank evaluates its own image shard; merged results must equal a
single-process run over both shards (reference comm.gather semantics,
panoptic_evaluation.py:119-122).
"""

import json
import os
import sys


def make_image(rank: int):
    """Deterministic (pred, gt) train-id panoptic maps per rank."""
    import numpy as np

    h, w = 64, 96
    gt = np.full((h, w), 1 * 1000, np.int64)          # road everywhere
    gt[8:40, 8:40] = 14 * 1000 + 1                    # a car instance
    pred = gt.copy()
    if rank == 1:
        # partially-overlapping car + a spurious person blob
        pred = np.full((h, w), 1 * 1000, np.int64)
        pred[16:48, 16:48] = 14 * 1000 + 1
        pred[50:60, 60:80] = 12 * 1000 + 1
    return pred, gt


def run(rank: int, evaluate: bool = True):
    import numpy as np

    from mgnet_tpu.data.catalog import Metadata
    from mgnet_tpu.data.categories import (
        CITYSCAPES_SCENE_SEG_CATEGORIES,
        build_meta,
    )
    from mgnet_tpu.evaluation import (
        DepthEvaluator,
        PanopticEvaluator,
        SemSegEvaluator,
    )

    meta = Metadata(name="mp").set(
        **build_meta(CITYSCAPES_SCENE_SEG_CATEGORIES)
    )
    pred, gt = make_image(rank)

    pan_ev = PanopticEvaluator(meta)
    pan_ev.process(pred, gt)

    sem_ev = SemSegEvaluator(meta)
    gt_inst = [{"category_id": 14, "mask": gt == 14 * 1000 + 1}]
    sem_ev.process(pred // 1000, gt // 1000, gt_instances=gt_inst)

    dep_ev = DepthEvaluator()
    dep_ev._errors.append([0.1 * (rank + 1)] * 7)

    out = {}
    if evaluate:
        out["panoptic"] = pan_ev.evaluate(print_table=False)["panoptic_seg"]
        out["sem"] = {
            k: v for k, v in sem_ev.evaluate()["sem_seg"].items()
        }
        out["depth"] = dep_ev.evaluate()["depth"]
    return out


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    from mgnet_tpu.parallel.multihost import (
        all_gather_objects,
        initialize_distributed,
        synchronize,
    )

    initialize_distributed(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)
    assert jax.process_count() == 2

    # variable-length object gather (the comm.all_gather analog)
    objs = all_gather_objects(
        {"rank": rank, "payload": list(range(rank * 5 + 1))}
    )
    assert [o["rank"] for o in objs] == [0, 1]
    assert len(objs[1]["payload"]) == 6

    results = run(rank, evaluate=True)
    synchronize()
    if rank == 0:
        print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
