"""Multi-host (multi-process) distributed backend.

SURVEY §2.2/§5 prescribe "`jax.distributed` + Mesh; ICI for TP/batch shards,
DCN across hosts" — the reference has no communication backend at all
(Cargo.toml:8-14 lists no comm dependency; it is a single-process CPU
program). This module is the TPU-native realization of that plan row:

  * one :func:`initialize` call per process (auto-detecting on TPU pods,
    explicit coordinator/process args for CPU test clusters);
  * a :func:`global_mesh` over ALL processes' devices, laid out so the
    tensor-parallel axis stays within a host — tp collectives ride ICI,
    only the outer dp/batch axis ever crosses DCN;
  * :func:`put_global` to build globally-sharded arrays from per-process
    host data (each process materializes only its addressable shards).

Everything downstream (model sharding specs, the train step, the decode
shardings pinned in model/decoder.py) is process-count agnostic: the same
`NamedSharding` annotations drive XLA to insert ICI collectives within a
host and DCN collectives across hosts. Multi-process operation is validated
on a 2-process x 4-virtual-CPU-device local cluster in
tests/test_parallel.py (the TPU answer to multi-node testing without a pod).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def is_initialized() -> bool:
    """True when this process already joined a jax.distributed cluster."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift
        return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Idempotent :func:`jax.distributed.initialize` wrapper.

    On TPU pods every argument auto-detects from the runtime environment
    (call with no arguments before any other jax API). For explicit
    clusters — e.g. the CPU multi-process tests — pass
    ``coordinator_address="host:port"``, ``num_processes`` and
    ``process_id``. Calling again after a successful join is a no-op.
    """
    if is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def global_mesh(
    n_devices: Optional[int] = None,
    tp: Optional[int] = None,
    config=None,
) -> Mesh:
    """A (dp, tp) mesh over the GLOBAL device set of all processes.

    Devices are ordered (process, local id) and the tp axis is the minor
    mesh axis, so every tp group is a run of consecutive devices of ONE
    process — tp collectives stay on ICI; the dp axis spans hosts and is
    the only axis whose collectives (gradient psum, batch all-gathers)
    cross DCN. ``tp`` is additionally constrained to divide the local
    device count; head-count divisibility is inherited from
    :func:`whisper_tpu.parallel.mesh.make_mesh`.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    local = jax.local_device_count()
    if tp is None:
        heads = None
        if config is not None:
            heads = min(config.n_audio_head, config.n_text_head)
        tp = 1
        for cand in (4, 2):
            if (
                (n_devices or len(devices)) % cand == 0
                and local % cand == 0
                and (heads is None or heads % cand == 0)
            ):
                tp = cand
                break
    elif local % tp:
        raise ValueError(
            f"tp={tp} does not divide the local device count {local}; a tp "
            f"group would span hosts and its collectives would ride DCN"
        )
    return make_mesh(n_devices=n_devices, tp=tp, devices=devices,
                     config=config)


def put_global(mesh: Mesh, spec: P, arr: np.ndarray) -> jax.Array:
    """Build a globally-sharded array from host data present on every
    process (each process materializes only its addressable shards).

    Single-process this is ``jax.device_put``; multi-process it uses the
    callback constructor so no process needs the non-addressable shards on
    device. ``arr`` must be the FULL global array (tests generate it from a
    shared seed; data loaders should pass their process's slice through
    :func:`jax.make_array_from_process_local_data` instead).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])
