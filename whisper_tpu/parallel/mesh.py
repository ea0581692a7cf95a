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
    config=None,
) -> Mesh:
    """Build a (dp, tp) mesh.

    tp defaults to the largest of {4, 2, 1} that divides the device count —
    and, when ``config`` is given, also divides both head counts, so
    ``make_mesh(8, config=tiny_cfg)`` picks tp=2 for tiny/base (6 heads)
    instead of an invalid tp=4.

    Raises a clear error when the backend has fewer than ``n_devices``
    devices (e.g. the single-chip axon TPU) instead of a reshape crash.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but backend "
            f"{jax.default_backend()!r} has only {len(devices)}; run under a "
            f"virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={n} + jax_platforms=cpu) or pass fewer n_devices"
        )
    devices = devices[:n]
    if tp is None:
        heads = None
        if config is not None:
            heads = min(config.n_audio_head, config.n_text_head)
        tp = 1
        for cand in (4, 2):
            if n % cand == 0 and (heads is None or heads % cand == 0):
                tp = cand
                break
    if n % tp:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
