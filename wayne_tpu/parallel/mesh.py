"""Mesh + sharding helpers for the (monte-carlo, exposure) axes."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, mc_shards: int | None = None) -> Mesh:
    """A 2D ('mc', 'exp') mesh over the given (or all) devices.

    The factorisation is chosen so both axes exist whenever more than one
    device is available: MC realisations shard on 'mc', exposures within
    a visit shard on 'exp'. On a single device both axes are 1 and the
    program is identical (SPMD-by-construction).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if mc_shards is None:
        mc_shards = n
        for cand in (int(np.sqrt(n)), 2):
            if n % cand == 0 and cand > 1 and n // cand > 1:
                mc_shards = n // cand
                break
    if mc_shards < 1:
        raise ValueError(f"mc_shards must be >= 1, got {mc_shards}")
    if n % mc_shards != 0:
        raise ValueError(f"{n} devices not divisible into mc_shards={mc_shards}")
    return Mesh(devices.reshape(mc_shards, n // mc_shards), ("mc", "exp"))


def _leaf_spec(leaf, n_batch_axes: int) -> P:
    names = ("mc", "exp")[:n_batch_axes]
    return P(*names, *([None] * (leaf.ndim - n_batch_axes)))


def shard_scenes(scenes, mesh: Mesh, n_batch_axes: int = 2):
    """Place a batched Scene pytree onto the mesh.

    Leaves are sharded along their leading batch axes ((mc, exp) for
    ensembles, (exp,) for a single visit) and replicated elsewhere.
    MC-invariant Scene fields (scene.MC_INVARIANT_FIELDS — the
    charge-memory maps, which carry no mc axis by design) shard their
    leading exp axis only and replicate across the 'mc' devices.
    """
    from jax.tree_util import GetAttrKey, tree_map_with_path

    from wayne_tpu.scene import MC_INVARIANT_FIELDS

    def put(path, x):
        name = next((p.name for p in path if isinstance(p, GetAttrKey)),
                    None)
        if n_batch_axes == 2 and name in MC_INVARIANT_FIELDS:
            spec = P("exp", *([None] * (x.ndim - 1)))
        else:
            spec = _leaf_spec(x, n_batch_axes)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return tree_map_with_path(put, scenes)
