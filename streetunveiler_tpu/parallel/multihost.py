"""Multi-host bootstrap + data loading (SURVEY.md §2.4 rows 1/5).

The reference is single-GPU; on a TPU pod each host loads only its own
camera shard and the global batch is assembled with
``jax.make_array_from_process_local_data`` — data crosses DCN only
through XLA collectives inside the step, never through host gathers.

Single-process (tests, one host) degrades to plain ``device_put``, so
the training loop calls these helpers unconditionally.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def bootstrap(coordinator_address: str | None = None,
              num_processes: int | None = None,
              process_id: int | None = None) -> int:
    """``jax.distributed.initialize`` with TPU auto-detection (the
    replacement for the reference's CUDA_VISIBLE_DEVICES bookkeeping).
    Returns this host's process index; no-op when already initialized or
    single-process."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
    return jax.process_index()


def local_camera_indices(n_cameras: int, mesh: Mesh) -> list[int]:
    """The camera indices this host is responsible for loading: an even
    contiguous split over processes (each host only decodes its share of
    the images — the reference loads everything everywhere)."""
    p = jax.process_index()
    n = max(jax.process_count(), 1)
    per = -(-n_cameras // n)
    return list(range(p * per, min((p + 1) * per, n_cameras)))


def make_global_batch(mesh: Mesh, w2c_local: np.ndarray, k_local: np.ndarray,
                      gt_local: np.ndarray, sem_local=None):
    """Assemble the (possibly multi-host) global camera batch sharded
    along the mesh 'data' axis; gt (and the optional semantic label maps)
    are additionally split row-wise over 'tile' by the step's shard_map
    in_specs.

    Each host passes ONLY its local cameras; with one process this is a
    plain sharded device_put."""
    spec_cam = NamedSharding(mesh, P("data"))
    spec_gt = NamedSharding(mesh, P("data", "tile"))
    if jax.process_count() <= 1:
        out = (jax.device_put(jnp.asarray(w2c_local), spec_cam),
               jax.device_put(jnp.asarray(k_local), spec_cam),
               jax.device_put(jnp.asarray(gt_local), spec_gt))
        if sem_local is not None:
            out += (jax.device_put(jnp.asarray(sem_local, jnp.int32),
                                   spec_gt),)
        return out
    mk = jax.make_array_from_process_local_data
    out = (mk(spec_cam, np.asarray(w2c_local)),
           mk(spec_cam, np.asarray(k_local)),
           mk(spec_gt, np.asarray(gt_local)))
    if sem_local is not None:
        out += (mk(spec_gt, np.asarray(sem_local, np.int32)),)
    return out
