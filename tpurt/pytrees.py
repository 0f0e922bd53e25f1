"""Pytree registration helper: NamedTuples with a mix of device-array
leaves and static (hashable) configuration fields.

Scene tables, samplers and cameras are passed to jitted render steps as
ARGUMENTS (never closed over): closed-over arrays become HLO constants,
which bloats compiles and defeats the persistent compilation cache.  With
static fields in aux_data, two scenes with equal array shapes share one
compiled executable.
"""

from __future__ import annotations

import jax


def register_static_pytree(cls, leaf_fields):
    """Register NamedTuple ``cls`` as a pytree whose children are
    ``leaf_fields`` (device arrays); all other fields are static aux."""
    fields = cls._fields
    leaf_fields = tuple(leaf_fields)
    static_fields = tuple(f for f in fields if f not in leaf_fields)

    def flatten(obj):
        leaves = tuple(getattr(obj, f) for f in leaf_fields)
        aux = tuple(getattr(obj, f) for f in static_fields)
        return leaves, aux

    def unflatten(aux, leaves):
        kw = dict(zip(leaf_fields, leaves))
        kw.update(dict(zip(static_fields, aux)))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls
