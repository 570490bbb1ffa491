"""Device mesh helpers for multi-chip execution.

The pipeline's scaling axes are #tracks, #observations and #RANSAC hypotheses
(SURVEY.md §2.3): all shard over a single 1-D mesh axis ("tracks"), with
cameras replicated — collectives ride ICI via psum in the BA normal-equation
assembly (parallel/ba_sharded.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

TRACK_AXIS = "tracks"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (TRACK_AXIS,))


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> Mesh:
    """Initialize multi-host execution and return the global mesh.

    On a TPU pod slice launched through the standard runtime, arguments are
    discovered automatically (jax.distributed.initialize()); explicit values
    support manual/DCN setups. Collectives then ride ICI within a slice and
    DCN across slices — the framework's replacement for a NCCL/MPI backend
    (the reference has no distributed story at all; SURVEY.md §2.3).
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return make_mesh()


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
