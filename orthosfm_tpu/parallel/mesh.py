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


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
