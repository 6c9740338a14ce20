"""Whole-visit device execution: vmap over exposures, chunked for memory.

The reference iterates exposures in a serial Python loop
(reference: wayne/observation.py :: Observation.generate). Here the whole
visit is one device program: exposures are stacked into a batched Scene
pytree and consumed by ``vmap(simulate_exposure)``; a ``lax.map`` over
fixed-size chunks bounds peak memory (the intermediate row-profile tensor
is per-exposure ~MBs) while keeping everything inside a single jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wayne_tpu.calibration import Tables
from wayne_tpu.config import ExposureStatic
from wayne_tpu.ops.exposure import ExposureResult, simulate_exposure
from wayne_tpu.scene import Scene


def pad_scenes(scenes: Scene, multiple: int) -> tuple[Scene, int]:
    """Pad a batched Scene along axis 0 to a multiple of ``multiple``."""
    n = jax.tree_util.tree_leaves(scenes)[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return scenes, n
    padded = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)]), scenes)
    return padded, n


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def simulate_visit(scenes: Scene, tables: Tables, cfg: ExposureStatic,
                   chunk: int = 8) -> ExposureResult:
    """Run every exposure of a visit on-device.

    Args:
      scenes: Scene pytree batched along axis 0 (N exposures; N must be a
        multiple of ``chunk`` — use :func:`pad_scenes`).
      chunk: exposures computed concurrently; sequential over chunks.

    Returns:
      ExposureResult with leading exposure axis: reads_dn (N, NR, S, S).
    """
    n = jax.tree_util.tree_leaves(scenes)[0].shape[0]
    if n % chunk != 0:
        raise ValueError(f"n_exposures {n} not a multiple of chunk {chunk}")
    n_chunks = n // chunk
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), scenes)
    run_chunk = jax.vmap(lambda s: simulate_exposure(s, tables, cfg))
    out = jax.lax.map(run_chunk, chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n,) + x.shape[2:]), out)
