"""Multi-host runtime setup + the sharding recipe.

The reference's "distribution" is ROS pub/sub on one machine (SURVEY.md
section 5.8). This engine scales over TPU slices:

  axis "dp"  — point-axis data parallelism inside one scan: association and
               normal-equation assembly shard over points; one psum of the
               (6,6)/(24,24)/(15F,15F) system per iteration rides the ICI
               (parallel/sharding.py).
  axis "mp"  — map-slot sharding for maps larger than one chip's HBM:
               points/occ arrays shard by slot range, keys replicate, KNN
               merges local top-k with one all_gather; inserts scatter only
               owned rows (parallel/map_shard.py). Exactness is tested.

Multi-host: each host ingests its own sensor stream (per-host native
loaders), `jax.distributed.initialize` forms the global mesh, and the
pose-graph solve shards keyframe ranges with the same matrix-free CG (its
Hv operator is a segment-sum, which psums across hosts over DCN).

This module is the thin host-side glue; on a single host it degrades to the
local device mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op on a single host."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes or os.environ.get("NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("PROCESS_ID", 0)),
    )


def make_mesh_2d(dp: Optional[int] = None, mp: int = 1) -> Mesh:
    """(dp, mp) mesh over all global devices: dp shards scan points, mp shards
    map slots. Defaults to all devices on the dp axis."""
    devs = np.array(jax.devices())
    n = devs.size
    if dp is None:
        dp = n // mp
    assert dp * mp == n, f"dp*mp={dp * mp} != devices={n}"
    return Mesh(devs.reshape(dp, mp), axis_names=("dp", "mp"))
