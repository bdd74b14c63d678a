"""Device mesh construction.

SURVEY.md §2.10: the reference's NCCL process-group + LongCat context
parallel (``init_context_parallel``, run_baseline.py:63-79; always run
degenerate at size 1) becomes a first-class ``jax.sharding.Mesh`` with
axes:

  data     - across videos / batch (the reference's SLURM-array DP)
  context  - across video tokens (the reference's cp_split_hw H/W split)
  tensor   - megatron-style qkv/ffn sharding (absent in the reference;
             needed on smaller-HBM TPUs)

Collectives are inserted by XLA (GSPMD) from sharding annotations; there
is no user-visible communication backend.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

AXES = ("data", "context", "tensor")


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host bootstrap (the analogue of the reference's NCCL
    process-group init, run_baseline.py:55-79, which it ran even for one
    GPU). On TPU pods the runtime usually self-discovers; explicit args
    or ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` env vars drive DCN bootstrap across hosts.
    Single-host (no coordinator configured): no-op, returns False —
    unlike the reference there is no degenerate world_size=1 backend to
    spin up."""
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return True
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def build_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(
            f"mesh {cfg} needs {n} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(cfg.data, cfg.context, cfg.tensor)
    return Mesh(dev, AXES)


def factorize_devices(n: int) -> MeshConfig:
    """Heuristic (data, context, tensor) factorization for n devices:
    prefer context (sequence) parallelism, then tensor, then data —
    matching the workload (single video per step, long token axis).
    The context axis is maximized: ring attention scales the dominant
    cost (token-axis attention) with near-linear ICI efficiency, while
    tensor sharding only pays off once HBM forces it — callers needing
    TP pass an explicit MeshConfig instead."""
    return MeshConfig(data=1, context=n, tensor=1)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), AXES)
