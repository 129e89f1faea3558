"""Device mesh construction and sharding helpers.

The reference bootstraps NCCL ranks from SLURM env vars in four different
places (dense-captioning distributed.py:141-153, VTG distribute_utils.py,
avion/utils/distributed.py:81, action-recognition utils.py:311-340). Here a
single mesh owns placement: 'data' for batch sharding (DDP equivalent) and
'seq' for sequence sharding (ring scan), with collectives compiled by XLA
over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a Mesh over the first n_devices devices.

    With one axis, shape defaults to (n,); with ('data','seq') and no shape,
    the seq axis gets min(n, 2) and data the rest — callers doing serious
    sequence parallelism pass an explicit shape.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        if len(axes) == 1:
            shape = (n_devices,)
        elif len(axes) == 2:
            seq = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
            shape = (n_devices // seq, seq)
        else:
            raise ValueError("pass an explicit shape for >2 mesh axes")
    need = int(np.prod(shape))
    if len(devices) < need:
        raise ValueError(
            f"make_mesh: need {need} devices for mesh shape {tuple(shape)} "
            f"{tuple(axes)} but only {len(devices)} are visible on backend "
            f"'{jax.default_backend()}'. For CPU simulation set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=<n> AND "
            "jax.config.update('jax_platforms','cpu') before any device "
            "query (the axon TPU plugin ignores JAX_PLATFORMS)."
        )
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def data_parallel_sharding(mesh: Mesh, batch_axes: int = 1):
    """NamedSharding putting axis 0 of a batch on the 'data' mesh axis."""
    spec = P("data", *([None] * (batch_axes - 1))) if batch_axes else P()
    return NamedSharding(mesh, spec)


def shard_batch(mesh: Mesh, batch):
    """Place a pytree batch with leading batch axis sharded over 'data'.

    Single-process: the batch is global; device_put splits it. Multi-host
    (pod) runs: each process holds only ITS sampler shard
    (`data.sampler.ShardedSampler`), so the global array is assembled from
    process-local pieces instead (`parallel/multihost.py`).
    """
    if jax.process_count() > 1:
        from .multihost import local_batch_to_global

        return local_batch_to_global(mesh, batch)

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate_params(mesh: Mesh, params):
    """Fully replicate a parameter pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), params)
