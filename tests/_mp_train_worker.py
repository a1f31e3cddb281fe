"""Worker for the 2-process multihost TRAINING test (test_multiprocess.py).

Each rank builds only its local slice of the deterministic global batch;
``shard_batch`` assembles the global array via
``make_array_from_process_local_data`` and the compiled train step runs
SPMD over the 2x2-device global mesh. Run with nprocs=1 for the
single-process reference (full global batch on a 4-device mesh) — the
two must produce identical metrics and updated parameters (reference DDP
train semantics, tools/train_net.py:241-248).

Usage: _mp_train_worker.py <rank> <nprocs> <port>
"""

import json
import os
import sys


def main():
    rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    from mgnet_tpu.parallel.multihost import initialize_distributed

    if nprocs > 1:
        initialize_distributed(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=rank)
        assert jax.process_count() == nprocs
    n_global = len(jax.devices())
    assert n_global == 4, f"expected 4 global devices, got {n_global}"

    import numpy as np

    from mgnet_tpu.config import get_default_config
    from mgnet_tpu.data.synthetic import synthetic_train_batch
    from mgnet_tpu.models.mgnet import build_model
    from mgnet_tpu.parallel import create_mesh, replicate_to_mesh, shard_batch
    from mgnet_tpu.train import create_train_state, make_train_step

    cfg = get_default_config()
    cfg.MODEL.COMPUTE_DTYPE = "float32"
    cfg.MODEL.SEM_SEG_HEAD.OHEM_N_MIN = 256
    cfg.SOLVER.MAX_ITER = 100
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.IMS_PER_BATCH = 4

    model = build_model(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0), sample_shape=(4, 64, 64, 3)
    )
    mesh = create_mesh()
    state = replicate_to_mesh(mesh, state)

    global_batch = synthetic_train_batch(4, 64, 64, seed=0)
    local = global_batch if nprocs == 1 else {
        k: v[rank * 2:(rank + 1) * 2] for k, v in global_batch.items()
    }
    step = jax.jit(make_train_step(cfg, model))
    for _ in range(2):
        batch = shard_batch(mesh, local)
        state, metrics = step(state, batch)

    host_metrics = {k: float(v) for k, v in metrics.items()}
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    checksum = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
    stats_leaves = jax.tree_util.tree_leaves(
        jax.device_get(state.batch_stats))
    stats_sum = float(sum(np.abs(np.asarray(x)).sum()
                          for x in stats_leaves))
    if rank == 0:
        print("RESULT " + json.dumps({
            "metrics": host_metrics,
            "param_checksum": checksum,
            "stats_checksum": stats_sum,
        }), flush=True)


if __name__ == "__main__":
    main()
