"""Batched host->device transfers.

Over a tunneled TPU, every individual transfer pays ~1 s of latency
regardless of size (measured: 16 MB in 0.10 s, but 140 small leaves in
~150 s). device_put_tree packs all leaves of a pytree into one flat buffer
per dtype, uploads each buffer once, and carves the leaves back out on
device inside a single jitted program.
"""

from __future__ import annotations

import jax
import numpy as np


def device_put_tree(tree, sharding=None):
    """Transfer an arbitrary (numpy/jax) pytree to device with O(#dtypes)
    transfers instead of O(#leaves)."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    host = [np.asarray(l) for l in leaves]
    by_dtype: dict[np.dtype, list[int]] = {}
    for i, l in enumerate(host):
        by_dtype.setdefault(l.dtype, []).append(i)

    out: list = [None] * len(host)
    for dtype, idxs in by_dtype.items():
        flat = np.concatenate([host[i].ravel() for i in idxs])
        buf = jax.device_put(flat, sharding)
        # static slicing inside one jit -> one compiled unpack program
        shapes = [host[i].shape for i in idxs]
        sizes = [host[i].size for i in idxs]
        offsets = np.cumsum([0] + sizes[:-1]).tolist()

        def unpack(b, _shapes=tuple(shapes), _sizes=tuple(sizes),
                   _offsets=tuple(offsets)):
            return [
                jax.lax.dynamic_slice_in_dim(b, o, s).reshape(shp)
                for o, s, shp in zip(_offsets, _sizes, _shapes)
            ]

        pieces = jax.jit(unpack)(buf)
        for i, piece in zip(idxs, pieces):
            out[i] = piece
    return jax.tree.unflatten(treedef, out)
