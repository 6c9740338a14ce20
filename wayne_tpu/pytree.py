"""Pytree registration helper shared by every dataclass pytree.

One definition (instead of a copy per module) so any future change to
how dataclasses register — e.g. promoting some fields to meta_fields —
applies uniformly to Scene, fit results, MCMC chains and spot params.
"""

from __future__ import annotations

from dataclasses import fields

import jax


def register(cls):
    """Register a @dataclass as a JAX pytree with every field a leaf."""
    names = [f.name for f in fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=names,
                                            meta_fields=[])
