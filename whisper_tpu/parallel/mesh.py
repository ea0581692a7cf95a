"""Device mesh construction.

The reference is single-process CPU with no distributed backend (SURVEY §2.2;
Cargo.toml has no comm dependency). Here scale-out is mesh-native: a
``jax.sharding.Mesh`` over ("dp", "tp") — data parallel over batch/streams,
tensor parallel over attention heads / MLP hidden — with XLA inserting all
collectives. ICI carries tp traffic (dense, latency-bound); dp rides the
outer axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, tp) mesh.

    tp defaults to the largest power of two <= min(n_devices, 4) that divides
    the device count — heads counts (6/8/12/16/20) are even, so tp in {1,2,4}
    always divides them except tiny's 6 with tp=4; callers doing tp>2 on tiny
    should pass tp explicitly.
    """
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = list(devices)[:n]
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n % cand == 0:
                tp = cand
                break
    if n % tp:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
