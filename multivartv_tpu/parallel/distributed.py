"""Multi-host bring-up: jax.distributed initialization + global meshes.

The reference has no distributed communication backend of any kind
(SURVEY.md 2a: no NCCL/MPI/Gloo/UCX — single process, single host).  The
TPU-native equivalent is jax.distributed over ICI/DCN: every host runs the
same program, jax.distributed.initialize() wires the coordination service,
and jax.sharding.Mesh over jax.devices() (ALL hosts' devices) turns the
solver's NamedShardings into XLA collectives that ride ICI within a slice
and DCN across slices.

Typical multi-host fit:

    from multivartv_tpu.parallel import distributed, fit
    distributed.init_distributed()           # env-driven on TPU pods
    mesh, names = distributed.global_lattice_mesh(p=2)
    model = fit.mvtv_sharded(data, y, m=(4096, 4096), device_mesh=mesh)

On a TPU pod slice, initialize() auto-discovers the coordinator from the
runtime environment; explicit (coordinator_address, num_processes,
process_id) are for CPU/GPU clusters or tests.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Initialize jax.distributed exactly once (no-op on re-entry and on
    single-process runs with no coordinator configured).

    Returns True when a multi-process runtime is active after the call.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        # TPU pods: the runtime env carries everything; elsewhere a
        # single-process run needs no init at all.
        try:
            jax.distributed.initialize()
            _INITIALIZED = True
        except Exception:
            return False
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def global_lattice_mesh(p: int, dp: int = 1):
    """A lattice mesh over EVERY device of every initialized process.

    Axis layout matches parallel/fit.py::default_lattice_mesh — (dp, sx)
    for p == 1, (dp, sx, sy) for p >= 2 — but drawn from the global device
    list, so the spatial axes span hosts.  jax.devices() orders devices so
    that ICI neighbors are adjacent within a slice; the row-major reshape
    keeps the 'sy' (fastest) axis intra-host, which is where the stencil
    halo traffic concentrates.
    """
    from multivartv_tpu.parallel.fit import default_lattice_mesh
    return default_lattice_mesh(p, devices=jax.devices(), dp=dp)


def process_summary() -> dict:
    """Host-side observability of the distributed runtime."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "backend": jax.default_backend(),
    }
