"""Device mesh and sharding rules.

Replaces the reference's NCCL/accelerate/DeepSpeed distribution stack
(config/*.yaml, SURVEY.md §2.4-2.5) with a named JAX mesh and GSPMD
shardings:

  - DDP            -> batch axis sharded over "data"
  - ZeRO-1         -> optimizer state sharded over "data" (see train/)
  - (new) TP       -> large kernels sharded over "model"
  - per-GPU shell-script inference sharding -> episode batch over "data"

Collectives (psum/all-gather/reduce-scatter) are emitted by XLA from the
shardings; no explicit backend init is required.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """Multi-host initialization (one controller process per host).

    Replaces the reference's accelerate/DeepSpeed launcher + NCCL rendezvous
    (config/deepspeed_o1_4gpu.yaml main_process_port etc., SURVEY.md §2.5):
    on TPU pods `jax.distributed.initialize()` discovers everything from the
    environment; args are only needed off-TPU.
    """
    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
    axis_names=("data", "model"),
) -> Mesh:
    """Create a 2D ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_params_tp(params, mesh: Mesh, min_size: int = 1 << 16):
    """Tensor-parallel weight sharding rule.

    Kernels with >= `min_size` elements whose last dim divides the model-axis
    size are sharded over "model" on that dim (column parallel); everything
    else is replicated. XLA/GSPMD inserts the matching collectives.

    Returns a pytree of NamedShardings matching `params`.
    """
    model_size = mesh.shape["model"]

    def rule(leaf):
        if (
            model_size > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and leaf.shape[-1] % model_size == 0
        ):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def zero_shard_specs(tree, mesh: Mesh, min_size: int = 1 << 16):
    """ZeRO-style data-axis sharding specs for a grad/param-shaped tree.

    Leaves with >= `min_size` elements whose leading dim divides the data-axis
    size get P("data", ...) on dim 0; everything else replicates. Used for
    ZeRO-2 gradient sharding (constraining grads to these specs makes GSPMD
    lower the cross-data-axis gradient reduction to reduce-scatter + a
    sharded optimizer update, the DeepSpeed stage-2 dataflow —
    reference config/accelerate_deepspeed_o2_config.yaml).
    """
    data_size = mesh.shape["data"]

    def rule(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.size >= min_size
            and leaf.shape[0] % data_size == 0
        ):
            spec = ["data"] + [None] * (leaf.ndim - 1)
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_opt_state_zero1(opt_state, mesh: Mesh):
    """ZeRO-1 analog: shard Adam moments over the data axis where possible.

    Moment tensors whose leading dim divides the data-axis size get P("data",
    ...) on dim 0; scalars and small leaves replicate. Same policy as the
    ZeRO-2 gradient specs — one rule, applied to different trees.
    """
    return zero_shard_specs(opt_state, mesh)
