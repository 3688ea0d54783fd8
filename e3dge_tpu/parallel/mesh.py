"""Device-mesh parallelism (SURVEY.md §2.2 TPU-native equivalent).

The reference parallelizes with torch DDP over NCCL (4x V100): grad all-reduce,
DistributedSampler, SyncBatchNorm, pickled all_gather. Here the same semantics are
expressed declaratively with `jax.sharding` and one jit:

  * data parallel   — batch axis sharded over the 'dp' mesh axis; XLA inserts the
    grad all-reduce (psum over ICI) automatically from sharding propagation. This
    replaces DDP + reduce_loss_dict (utils/dist_utils.py:108-130).
  * ray parallel    — optional 'sp' mesh axis shards the ray (image height) axis of
    the renderer — the TPU analogue of the reference's serial ray chunking
    (volume_renderer.py:1083-1112); gives intra-batch scaling at batch 1.
  * SyncBatchNorm   — nn.BatchNorm(axis_name='dp') inside shard_map'd steps; under
    plain jit the global batch statistics are exact by construction since the batch
    is one logical array.
  * data sharding   — GAN-sampled batches are generated on-device (no input
    pipeline), so "DistributedSampler" is just the batch sharding itself.

Multi-host (DCN) note: with jax.distributed initialized, the same code runs over
multi-host meshes; device order from `jax.devices()` keeps DCN on the outer axis.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axes: Sequence[str] = ("dp",),
    shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh. Default: 1-D data-parallel over all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh: requested {n_devices} devices but jax.devices() has only "
                f"{len(devices)} on platform "
                f"'{devices[0].platform if devices else '?'}'. For CPU-hosted sharding "
                f"tests set JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={n_devices} BEFORE the JAX backend initializes."
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != len(devices):
        raise RuntimeError(
            f"make_mesh: mesh shape {tuple(shape)} needs {int(np.prod(shape))} devices, "
            f"got {len(devices)}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard axis 0 (batch) over the data-parallel mesh axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(tree: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Place a host batch with its leading axis split over the mesh.

    Raises early (with the offending shape) when the batch is not divisible by
    the dp axis — XLA's own error for uneven shards is far less readable."""
    n = mesh.shape[axis]
    s = batch_sharding(mesh, axis)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n != 0:
            raise ValueError(
                f"shard_batch: leading axis {x.shape[0]} of leaf shape {tuple(x.shape)} "
                f"is not divisible by mesh axis '{axis}' size {n}; pad the batch or "
                f"pick a batch size divisible by the dp degree"
            )
        return jax.device_put(x, s)

    return jax.tree.map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def data_parallel_step(
    step_fn: Callable,
    mesh: Mesh,
    state_replicated: bool = True,
    donate_state: bool = True,
) -> Callable:
    """jit a (state, *args) train step for the mesh: state replicated, everything
    else passed through (already-placed shardings are respected). Output state stays
    replicated. XLA derives the grad all-reduce from the batch sharding."""

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())

    def run(state, *args, **kwargs):
        return jitted(state, *args, **kwargs)

    return run


def constrain(x, mesh: Mesh, *spec) -> Any:
    """Convenience with_sharding_constraint under a named mesh."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
