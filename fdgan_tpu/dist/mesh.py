"""Device-mesh construction and sharding policies.

The reference's only parallelism is single-process `nn.DataParallel`
(demo.py:89). The TPU-native equivalent (SURVEY.md §2.8): a
`jax.sharding.Mesh` with a `data` axis for batch sharding and an optional
`spatial` axis for sharding the image H dimension of very large inputs —
XLA inserts the halo exchanges for spatially-sharded convolutions
automatically, riding ICI.

No hand-written communication: collectives are emitted by jit from the
sharding annotations. Multi-host entry goes through
`jax.distributed.initialize()` (see `maybe_init_distributed`).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Initialise multi-process JAX when launched under a cluster env.

    Opt-in via ``FDGAN_TPU_DIST=1``. With just the flag set, coordinates
    are auto-detected (``jax.distributed.initialize()`` with no arguments —
    the TPU-pod / cluster-manager path). For explicit launches (a v5e pod
    slice across hosts, or the 2-process CPU test in
    tests/test_multiprocess.py) the coordinates come from::

        FDGAN_TPU_DIST_COORD=host:port   coordinator address
        FDGAN_TPU_DIST_NPROCS=N          number of processes
        FDGAN_TPU_DIST_PID=i             this process's id

    MUST run before anything touches a JAX backend — even
    ``jax.process_count()`` would initialise single-process and make the
    real initialize() fail. Failures are logged, not swallowed silently: a
    cluster job that falls back to single-host should say so loudly."""
    if not os.environ.get("FDGAN_TPU_DIST", ""):
        return
    coord = os.environ.get("FDGAN_TPU_DIST_COORD") or None
    nprocs = os.environ.get("FDGAN_TPU_DIST_NPROCS")
    pid = os.environ.get("FDGAN_TPU_DIST_PID")
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nprocs) if nprocs is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
    except Exception as e:
        if nprocs is not None or pid is not None:
            # explicit coordinates: falling back single-host would make THIS
            # worker believe it is process 0 of 1 — it would then run a
            # duplicate training that interleaves logs and clobbers the real
            # run's checkpoints on shared storage. Die instead.
            raise SystemExit(
                f"FDGAN_TPU_DIST: jax.distributed.initialize("
                f"coord={coord!r}, nprocs={nprocs}, pid={pid}) failed: "
                f"{type(e).__name__}: {e}"
            )
        import warnings

        warnings.warn(
            f"FDGAN_TPU_DIST is set but jax.distributed.initialize() "
            f"failed ({type(e).__name__}: {e}); continuing single-host",
            RuntimeWarning,
            stacklevel=2,
        )


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh. Default: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None) -> NamedSharding:
    """NHWC batch sharded on 'data'; optionally H sharded on 'spatial'."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * 4
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sharding):
    """device_put single-process; assemble a global array from this
    process's local shard under multi-process (each process passes ITS
    slice of the batch; for a replicated spec every process passes the
    full, identical value)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Device-put a host batch with the DP (+SP) layout.

    Multi-process: ``batch`` is this process's LOCAL slice (global batch //
    process_count rows); the returned arrays are global."""
    sharding = batch_sharding(mesh, 1 if spatial else None)
    return jax.tree.map(lambda x: _put(x, sharding), batch)


def shard_params(params, mesh: Mesh):
    """Replicate parameters across the mesh (model is ~1e7 params — far
    below the threshold where TP would pay; SURVEY.md §2.8). Multi-process:
    every process passes the same host values (same PRNG seed / same
    checkpoint), which IS the replicated global array."""
    return jax.tree.map(lambda x: _put(x, replicate_sharding(mesh)), params)
