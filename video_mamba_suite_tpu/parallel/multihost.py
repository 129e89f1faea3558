"""Multi-host (multi-process) bootstrap + per-process batch assembly.

The reference discovers NCCL ranks from SLURM/OMPI env vars in four
separate per-suite idioms (dense-captioning ``distributed.py:141-153``,
VTG ``main/distribute_utils.py:42-115``, avion
``avion/utils/distributed.py:81``, action-recognition
``utils.py:311-340``) and launches with srun shell scripts (egocentric
``scripts/*/*.sh``, action-recognition ``exp/k400/*/run_f16x224.sh`` —
up to 16 GPUs / 2 nodes). The TPU-native story collapses all of that to
ONE call per process: :func:`initialize` (a thin policy layer over
``jax.distributed.initialize``), after which ``jax.devices()`` is the
GLOBAL device list, a ``Mesh`` owns placement (``parallel/mesh.py``),
and the same SPMD program runs on every host with XLA collectives over
ICI/DCN — there is no rank-conditional model code anywhere.

What each reference concept maps to:

=====================================  ==================================
reference (torch.distributed)          here
=====================================  ==================================
``init_process_group(backend=nccl)``   ``multihost.initialize()``
``get_rank()`` / ``get_world_size()``  ``jax.process_index()/_count()``
``DistributedSampler``                 ``data.sampler.ShardedSampler``
rank-0 gating (``is_main_process``)    ``multihost.is_primary()``
``dist.barrier()``                     ``multihost.sync_global_devices``
DDP gradient buckets                   XLA all-reduce inserted by jit
                                       over the replicated-param mesh
=====================================  ==================================

Launch model (see ``scripts/``): run the *same* command on every host.
On TPU pods / SLURM / OMPI / GKE, ``jax.distributed.initialize`` finds
the coordinator automatically; elsewhere pass the three env vars
``VMS_COORDINATOR`` (host:port of process 0), ``VMS_NUM_PROCESSES``,
``VMS_PROCESS_ID``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_initialized = False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def resolve_spec(environ=None):
    """Resolve (coordinator_address, num_processes, process_id) from env.

    Precedence: explicit ``VMS_*`` vars > nothing (None triple — defer to
    jax's own cluster auto-detection for TPU pods / SLURM / OMPI / K8s).
    Returns the triple; all-None means "let jax decide or stay
    single-process".
    """
    env = os.environ if environ is None else environ
    addr = env.get("VMS_COORDINATOR") or None
    nproc = env.get("VMS_NUM_PROCESSES")
    pid = env.get("VMS_PROCESS_ID")
    return (
        addr,
        int(nproc) if nproc not in (None, "") else None,
        int(pid) if pid not in (None, "") else None,
    )


def should_initialize(environ=None) -> bool:
    """True when a multi-process launch is detectable from the environment.

    Used by trainer entry points so a plain single-host run never pays the
    coordinator round-trip (and never blocks waiting for peers).
    """
    env = os.environ if environ is None else environ
    if env.get("VMS_COORDINATOR"):
        return True
    # markers jax's cluster auto-detection keys on (SLURM multi-task,
    # OMPI, TPU-pod metadata); single-task SLURM jobs stay local
    ntasks = env.get("SLURM_NTASKS")
    if ntasks and int(ntasks) > 1:
        return True
    if env.get("OMPI_COMM_WORLD_SIZE") and int(env["OMPI_COMM_WORLD_SIZE"]) > 1:
        return True
    # single-worker TPU VMs also export TPU_WORKER_HOSTNAMES (one entry);
    # only a multi-entry list means a pod slice needing coordination
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    force: bool = False,
) -> bool:
    """Bootstrap multi-process jax. Returns True if initialization ran.

    Idempotent, and a no-op when neither explicit args nor a recognizable
    multi-process environment are present — safe to call unconditionally
    at the top of every trainer (the reference's four env-sniffing
    ``init_distributed_mode`` variants collapse to this).

    Must run BEFORE any other jax API touches a backend (device queries
    bind the local-only platform otherwise) — call it first thing in
    ``main``.
    """
    global _initialized
    if _initialized:
        return True
    explicit = bool(coordinator_address or num_processes
                    or process_id is not None)
    if not (explicit or force or should_initialize()):
        return False
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        import warnings

        warnings.warn(
            "multihost.initialize() called after a jax backend was already "
            "bound (device query / computation ran first) — continuing "
            "single-process. Call it first thing in main()."
        )
        return False
    env_addr, env_np, env_pid = resolve_spec()
    jax.distributed.initialize(
        coordinator_address=coordinator_address or env_addr,
        num_processes=num_processes if num_processes is not None else env_np,
        process_id=process_id if process_id is not None else env_pid,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def is_primary() -> bool:
    """True on the process that should own logging/tensorboard/stdout.

    Checkpointing is NOT gated on this: orbax multi-host saves need every
    process to participate (each writes its addressable shards).
    """
    return jax.process_index() == 0


def local_batch_to_global(mesh, local_batch: Any, batch_axes: int = 1):
    """Assemble per-process local batches into one global sharded pytree.

    Each process passes only ITS shard (what its ShardedSampler loaded);
    the result is a pytree of global ``jax.Array``\\ s whose leading axis is
    sharded over the mesh's 'data' axis — the input contract of every
    jitted SPMD train step here. Single-process this degrades to a plain
    sharded device_put (identical placement, no copies beyond it).

    ``batch_axes`` leading axes are treated as batch-like (sharded over
    'data' on axis 0 only, like ``mesh.shard_batch``).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim else P()
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)


def sync_global_devices(name: str = "barrier") -> None:
    """Block until every process reaches this point (dist.barrier())."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def process_allgather(x):
    """Gather a host-local array from every process (eval-time embedding
    gather, ``main_lavila_finetune_mir.py:524-536`` equivalent)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(np.asarray(x))
