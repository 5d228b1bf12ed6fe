"""Device mesh and sharding helpers.

The reference's distributed stack — torchrun process spawn, NCCL process
group, DistributedSampler, DDP gradient all-reduce, SyncBN
(reference run.py:42, common/utils.py:148-192, train.py:364-368) — collapses
on TPU into: one jax process per host, a 1-D ``Mesh`` over all chips, batch
sharded on the ``data`` axis, params replicated. XLA inserts the gradient
all-reduce during jit compilation; metric reduction uses the same mesh.

Scaling beyond data-parallel (the models are ~390M params and fit per-chip)
is expressed by adding named axes here; shardings are centralized so model
code never mentions devices.
"""

from __future__ import annotations

import os


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _slurm_rendezvous():
    """SLURM-launched rendezvous (reference common/utils.py:157-172:
    submitit JobEnvironment / SLURM_PROCID fallbacks).

    Returns (coordinator, num_processes, process_id) when running under a
    multi-task SLURM step without explicit coordinator env vars, else None.
    The coordinator is task 0's node (first entry of the expanded nodelist),
    on a port derived from the job id so concurrent jobs on a shared node
    don't collide — the same convention the reference's get_init_file
    shared-FS rendezvous exists to solve."""
    if "SLURM_PROCID" not in os.environ or "SLURM_NTASKS" not in os.environ:
        return None
    ntasks = int(os.environ["SLURM_NTASKS"])
    if ntasks <= 1:
        return None
    nodelist = os.environ.get("SLURM_STEP_NODELIST",
                              os.environ.get("SLURM_JOB_NODELIST", ""))
    # expand "prefix[a-b,c],other" -> first hostname; scontrol is the
    # canonical expander but may be absent inside containers
    try:
        import subprocess
        first = subprocess.run(
            ["scontrol", "show", "hostnames", nodelist],
            capture_output=True, text=True, timeout=10,
        ).stdout.split()[0]
    except (OSError, IndexError, subprocess.TimeoutExpired):
        import re
        m = re.match(r"([^\[,]+)(?:\[([^\]\-,]+))?", nodelist)
        if not m or not m.group(1):
            return None
        first = m.group(1) + (m.group(2) or "")
    port = 12300 + int(os.environ.get("SLURM_JOB_ID", "0")) % 20000
    return (f"{first}:{port}", ntasks, int(os.environ["SLURM_PROCID"]))


def init_distributed(logger=None):
    """Multi-host init (reference utils.init_distributed_mode equivalent).

    Uses jax.distributed when launched with the standard coordinator env
    vars; falls back to a SLURM rendezvous (reference
    common/utils.py:157-172) when launched as a multi-task SLURM step;
    single-host runs need nothing.
    """
    if "JAX_COORDINATOR_ADDRESS" in os.environ or \
            "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    else:
        slurm = _slurm_rendezvous()
        if slurm is not None:
            coordinator, nprocs, pid = slurm
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=nprocs, process_id=pid)
    info = {
        "world_size": jax.process_count(),
        "rank": jax.process_index(),
        "distributed": jax.process_count() > 1,
        "num_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }
    if info["distributed"] and info["rank"] != 0:
        # non-master processes log errors only
        # (reference utils.setup_for_distributed, common/utils.py:97-116)
        import logging as _logging
        _logging.getLogger().setLevel(_logging.ERROR)
    if logger is not None:
        logger.info("jax devices: %d global / %d local, process %d/%d",
                    info["num_devices"], info["local_devices"],
                    info["rank"], info["world_size"])
    return info


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def local_device_count() -> int:
    return jax.local_device_count()


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Stage a batch with the leading axis sharded over the mesh.

    Single-process meshes use ``device_put``. When the mesh spans multiple
    processes, each process holds its own rank-local shard (BatchLoader
    with shard_id=rank), so the global array must be assembled with
    ``make_array_from_process_local_data`` — device_put would treat every
    process's DIFFERENT local shard as the same global batch, silently
    feeding each device a fraction of its rows.
    """
    multiprocess = jax.process_count() > 1 and \
        mesh.devices.size > jax.local_device_count()

    def put(x):
        spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    """Replicate params/optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def gather_from_all(array):
    """Gather per-process arrays to every process, concatenated on axis 0
    (reference utils.gather_from_all, common/utils.py:207-232)."""
    if jax.process_count() == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(array))
    return np.concatenate(list(gathered), axis=0)
