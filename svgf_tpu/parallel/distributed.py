"""Multi-host bootstrap (DCN) — the comm-backend component SURVEY §2.7 /
§5 mandates (the reference is single-GPU, App.cu:414-468; this capability is
new per the BASELINE north star: >=85% scaling efficiency to N>=2 hosts).

Topology recipe (jax-ml.github.io/scaling-book): one process per host,
`jax.distributed.initialize` rendezvous over DCN, then a (host, chip) mesh —
image rows sharded over the HOST axis (one N/S halo strip per stencil
crosses DCN) and columns over the CHIP axis (dense E/W halos stay on ICI).
XLA inserts the right collectives from the shardings; nothing here speaks
NCCL/MPI.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Bring up the JAX distributed runtime (idempotent).

    With no arguments, reads the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or cloud-TPU metadata which
    jax.distributed discovers automatically). Single-process runs (no
    coordinator configured) are a no-op. Returns the process count.
    """
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return 1  # single host — nothing to rendezvous

    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_count()


def make_host_chip_mesh(hosts: int | None = None,
                        chips_per_host: int | None = None,
                        axes: tuple[str, str] = ("host", "chip")):
    """(host, chip) 2-D mesh over all addressable devices.

    jax.devices() is process-major, so reshaping (hosts, chips_per_host)
    puts each host's chips on one row — the `chip` axis rides ICI, the
    `host` axis rides DCN. Pass explicit sizes to subset (e.g. a 2x4 mesh on
    a single 8-device CPU host for the dryrun).
    """
    import numpy as np

    devs = jax.devices()
    if hosts is None:
        hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // hosts
    n = hosts * chips_per_host
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs[:n]).reshape(hosts, chips_per_host), axes)
