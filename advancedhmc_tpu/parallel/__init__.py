"""Chain-parallel scale-out over device meshes (ICI/DCN via GSPMD)."""

from .mesh import (
    CHAIN_AXIS,
    chain_sharding,
    mesh_of_all_devices,
    replicated,
    shard_hmc_state,
)

__all__ = [
    "CHAIN_AXIS",
    "chain_sharding",
    "mesh_of_all_devices",
    "replicated",
    "shard_hmc_state",
]
