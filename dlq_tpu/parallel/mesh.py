"""Device mesh construction for single-chip, single-host, and multi-host
v5e topologies.

TPU-native replacement for the reference's (nonexistent) distributed layer:
`jax.make_mesh` + GSPMD collectives over ICI/DCN instead of hand-written
transports (SURVEY §2.7 table). Axis convention:

  "data"  — batch sharding (DP): images across chips
  "model" — weight sharding (TP): output channels / heads across chips

A 2D (data, model) mesh covers every BASELINE config; pipeline/sequence/
expert parallelism are documented non-goals (SURVEY §5.7).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1 = all remaining devices
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model) mesh over available devices.

    With ``data=-1`` the data axis absorbs ``len(devices) // model``.
    On multi-host deployments call `init_distributed` first; the mesh then
    spans all hosts' devices with ICI-contiguous model groups (jax's device
    order keeps same-host devices adjacent, so the model axis — which
    carries the chatty all-reduces — rides ICI, not DCN).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = cfg.model
    data = cfg.data if cfg.data != -1 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    # Auto axis types: let GSPMD propagate shardings and insert collectives
    # (jax>=0.7 meshes default to explicit sharding-in-types, which demands
    # out_sharding on every op with mixed operand shardings — not our model)
    auto = (jax.sharding.AxisType.Auto,) * len(cfg.axis_names)
    return jax.make_mesh((data, model), cfg.axis_names, devices=devices, axis_types=auto)


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host runtime init (jax.distributed). No-ops on a single host.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are None, so launchers can drive it purely by environment.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations: batch along "data", replicated along "model"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
