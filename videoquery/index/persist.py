"""Binary embedding shards: fast persistent storage for segment indexes.

The north star has load_db "batch whole videos into segment-level embedding
shards" (BASELINE.json). CSV is the reference-interchange format
(index/csvio.py); shards are the production format: one .npz per shard with
the dense [S, K, n, D] block + ids + metadata, memory-mappable, written so a
1M-segment index loads in seconds instead of re-parsing gigabytes of CSV.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from videoquery.index.store import FeatureIndex

FORMAT_VERSION = 1


def save_index(index: FeatureIndex, directory: str,
               shard_clips: int = 65536) -> list[str]:
    """Write the index as one or more .vqidx.npz shards + a manifest."""
    os.makedirs(directory, exist_ok=True)
    feats = np.asarray(index.feats)
    mask = np.asarray(index.mask)
    n = index.n_clips
    paths = []
    shard_id = 0
    for start in range(0, n, shard_clips):
        end = min(start + shard_clips, n)
        path = os.path.join(directory, f"shard_{shard_id:05d}.vqidx.npz")
        np.savez(
            path,
            feats=feats[:, :, start:end],
            mask=mask[:, :, start:end],
            clip_ids=index.clip_ids[start:end],
        )
        paths.append(path)
        shard_id += 1
    manifest = {
        "version": FORMAT_VERSION,
        "streams": list(index.streams),
        "splits": list(index.splits),
        "feature_name": index.feature_name,
        "feature_dim": index.feature_dim,
        "n_clips": int(n),
        "shards": [os.path.basename(p) for p in paths],
        "dtype": str(feats.dtype),
    }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return paths


def load_index_binary(directory: str, pad_multiple: int = 8,
                      dtype=None, keep_host: bool = False,
                      device_put: bool = True, sharding=None) -> FeatureIndex:
    """Load a .vqidx shard directory back into a (optionally sharded) device
    FeatureIndex."""
    import jax
    import jax.numpy as jnp

    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported index format v{manifest['version']}")
    feats_parts, mask_parts, id_parts = [], [], []
    for shard in manifest["shards"]:
        with np.load(os.path.join(directory, shard)) as z:
            feats_parts.append(z["feats"])
            mask_parts.append(z["mask"])
            id_parts.append(z["clip_ids"])
    feats = np.concatenate(feats_parts, axis=2)
    mask = np.concatenate(mask_parts, axis=2)
    clip_ids = np.concatenate(id_parts)
    n = manifest["n_clips"]
    n_pad = -(-max(n, 1) // pad_multiple) * pad_multiple
    if n_pad != feats.shape[2]:
        pad = n_pad - feats.shape[2]
        feats = np.pad(feats, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = np.pad(mask, ((0, 0), (0, 0), (0, pad)))
    feats_j = jnp.asarray(feats, dtype or feats.dtype)
    mask_j = jnp.asarray(mask)
    if device_put and sharding is not None:
        feats_j = jax.device_put(feats_j, sharding)
        mask_j = jax.device_put(mask_j, sharding)
    index = FeatureIndex(
        clip_ids, feats_j, mask_j,
        tuple(manifest["streams"]), tuple(manifest["splits"]),
        manifest["feature_name"],
    )
    if keep_host:
        index.host_feats = feats.astype(np.float64)
        index.host_mask = mask
    return index
