"""Worker process for tests/test_multiprocess.py — not a test module.

Each invocation is ONE process of an N-process JAX cluster over localhost
(CPU backend, gloo collectives, 4 local devices). It builds the global
8-device ('data','spatial') mesh, assembles the global batch from its
process-local slice via jax.make_array_from_process_local_data, runs one
data-parallel FDGAN train step, and dumps losses + post-step parameter
norms as JSON for the parent test to compare against the single-process
value (SURVEY §2.8 comm-backend row: jax.distributed.initialize is the
multi-host deliverable).

Usage: python mp_worker.py <pid> <nprocs> <coordinator_port> <out.json> [dp|sp]

``sp`` shards the image H axis over all 8 devices instead of the batch —
the conv halo exchanges then CROSS the process boundary (the v5e-pod
high-res mode), which single-process mesh tests can't exercise.
"""

import json
import os
import sys


def main():
    pid, nprocs, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"
    # do NOT inherit the parent pytest env's 8-device host-platform trick —
    # this process contributes exactly 4 local devices to the global mesh
    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )

    import numpy as np

    from fdgan_tpu.dist.mesh import make_mesh, shard_batch, shard_params
    from fdgan_tpu.train import create_train_state, make_train_step

    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs
    assert len(jax.local_devices()) == 4

    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(123)
    if mode == "sp":
        # H axis over all 8 devices (remat="stages" — the high-res recipe);
        # each process's local slice is a horizontal BAND of every image,
        # so GSPMD's conv halo exchanges cross the process boundary
        step = make_train_step(tx_g, tx_d, remat="stages")
        mesh = make_mesh(n_data=1, n_spatial=4 * nprocs)
        haze = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        gt = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        band = 64 // nprocs
        local = (
            haze[:, pid * band:(pid + 1) * band],
            gt[:, pid * band:(pid + 1) * band],
        )
        state.g_params = shard_params(state.g_params, mesh)
        state.d_params = shard_params(state.d_params, mesh)
        batch = shard_batch(local, mesh, spatial=True)
        assert batch[0].shape == (1, 64, 64, 3)
    else:
        step = make_train_step(tx_g, tx_d)
        mesh = make_mesh(n_data=4 * nprocs, n_spatial=1)
        state.g_params = shard_params(state.g_params, mesh)
        state.d_params = shard_params(state.d_params, mesh)
        # deterministic GLOBAL batch; this process contributes its row slice
        # (DP losses/grads are row-permutation-invariant, so slice order
        # doesn't matter for parity)
        haze = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
        gt = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
        rows = 8 // nprocs
        local = (haze[pid * rows:(pid + 1) * rows], gt[pid * rows:(pid + 1) * rows])
        batch = shard_batch(local, mesh)
        assert batch[0].shape == (8, 32, 32, 3)  # global shape from local slices

    state, metrics = step(state, batch[0], batch[1], jax.random.PRNGKey(1))

    result = {
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "metrics": {k: float(v) for k, v in metrics.items()},
        "g_norms": {
            jax.tree_util.keystr(kp): float(
                np.linalg.norm(np.asarray(jax.device_get(v)).ravel())
            )
            for kp, v in jax.tree_util.tree_flatten_with_path(state.g_params)[0][:8]
        },
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
