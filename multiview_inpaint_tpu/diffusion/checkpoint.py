"""Diffusion checkpoint I/O: flattened-npz param trees.

Equivalent of the reference's pruned PL checkpoints
(``csvd.py:1243-1256`` saves only ``control_model.*``): ControlNet-only
checkpoints by default, with tolerant loading (missing/extra keys
reported, not fatal — mirroring ``init_from_test``/``ckpt_path2``
semantics in ``diffusion.py:93-165``).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def save_params(path: str, params: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(params).items()}
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Dict:
    z = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
    return unflatten_dict(flat)


def merge_params(base: Dict, loaded: Dict) -> Tuple[Dict, list, list]:
    """Tolerant overlay of ``loaded`` onto ``base`` (shape-checked).

    Returns (merged, missing_keys, unexpected_keys).
    """
    base_flat = flatten_dict(base)
    loaded_flat = flatten_dict(loaded)
    merged = dict(base_flat)
    unexpected = []
    for k, v in loaded_flat.items():
        if k in base_flat and base_flat[k].shape == v.shape:
            merged[k] = v
        else:
            unexpected.append("/".join(k))
    missing = ["/".join(k) for k in base_flat if k not in loaded_flat]
    return unflatten_dict(merged), missing, unexpected
