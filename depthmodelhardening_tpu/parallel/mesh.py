"""Device-mesh and sharding helpers.

The reference trains on a single hard-coded CUDA device (my_utils.py:10)
with no distributed backend of any kind. The TPU-native equivalent is
batch data parallelism over an ICI mesh: parameters replicated, batches
sharded on their leading axis, gradients reduced by XLA-inserted psums.
The adversarial-training step (attack inner loop + hardening update) is
embarrassingly batch-parallel, so a 1-D "data" mesh covers the workload;
the helpers still accept arbitrary mesh shapes for multi-host DCN
layouts (data axis outer/DCN, model axis reserved for future use).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_HOST_COUNT_FLAG = "xla_force_host_platform_device_count"


def set_host_device_count_flag(n_devices: int) -> None:
    """Request >= n virtual CPU devices via XLA_FLAGS.

    Must run before the CPU backend initializes (any jax.devices() /
    first trace initializes ALL registered backends). A preset flag is
    RAISED to n_devices when smaller (a substring-presence check alone
    would silently keep a too-small value and defeat the request).
    """
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(rf"--{_HOST_COUNT_FLAG}=(\d+)", flags)
    if m is None:
        os.environ["XLA_FLAGS"] = (
            flags + f" --{_HOST_COUNT_FLAG}={n_devices}").strip()
    elif int(m.group(1)) < n_devices:
        os.environ["XLA_FLAGS"] = flags.replace(
            m.group(0), f"--{_HOST_COUNT_FLAG}={n_devices}")


def ensure_virtual_cpu_devices(n_devices: int) -> list:
    """Provision >= n_devices virtual CPU devices and return them.

    The CPU backend initializes lazily on first access, so setting
    XLA_FLAGS here still takes effect even when another platform (TPU)
    is already up — the standard JAX recipe for testing multi-chip
    sharding without multi-chip hardware. Raises with a recipe if the
    CPU backend was already initialized with fewer devices.
    """
    set_host_device_count_flag(n_devices)
    cpus = jax.devices("cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"need {n_devices} virtual CPU devices but the CPU backend "
            f"is already initialized with {len(cpus)}; start the process "
            f"with XLA_FLAGS=--{_HOST_COUNT_FLAG}={n_devices}")
    return cpus[:n_devices]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence] = None,
              allow_virtual: bool = True) -> Mesh:
    """A device mesh; default: 1-D "data" mesh over all local devices.

    When more devices are requested than the default platform has,
    degrade to a virtual host-platform (CPU) mesh instead of failing
    closed — sharding semantics (psum reductions, batch sharding) are
    identical, only the silicon differs. Pass allow_virtual=False to
    get the old strict behavior.

    A caller that gets the virtual fallback in a process whose frozen
    default backend is TPU must wrap its mesh computations in
    ops.dispatch.pallas_disabled() (TPU pallas kernels cannot be emitted
    into the CPU program); this constructor deliberately does NOT flip
    that switch itself — a global side effect from a constructor would
    silently degrade subsequent same-process TPU work.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            if not allow_virtual:
                raise ValueError(
                    f"requested a {n_devices}-device mesh but only "
                    f"{len(devices)} devices are visible")
            devices = ensure_virtual_cpu_devices(n_devices)
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available")
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           required: bool = False) -> bool:
    """Multi-host (DCN) runtime initialization.

    Wraps jax.distributed.initialize: on Cloud TPU pods the arguments
    autodetect from the metadata server / TPU env vars; elsewhere pass
    coordinator_address ("host:port"), num_processes and process_id.
    Returns True when the distributed runtime is up (or already was).
    With required=False (default) an AUTODETECT failure (no coordinator
    in the environment, i.e. a single-host launch) returns False so
    call sites can share code between single- and multi-host launches.
    Explicit coordinator arguments signal multi-host intent and always
    raise on failure — silently degrading such a launch would train N
    unsynchronized single-host copies.
    """
    try:
        if jax.distributed.is_initialized():
            return True
    except AttributeError:  # older jax
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
        required = True
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except Exception:
        if required:
            raise
        return False


def make_global_mesh(axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh over ALL global devices (every process), laid out
    DCN-outer / ICI-inner so that the batch axis's gradient psum runs
    hierarchically: reduce-scatter over ICI within each host's slice,
    then the small cross-host exchange over DCN.

    Single-process it degenerates to make_mesh(); multi-host it requires
    initialize_distributed() to have run first.
    """
    if jax.process_count() == 1:
        return make_mesh(axis_names=axis_names)
    n_proc = jax.process_count()
    per_proc = len(jax.devices()) // n_proc
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (per_proc,), (n_proc,), devices=jax.devices())
    except ValueError:
        # devices without TPU slice topology (e.g. multi-process CPU
        # meshes in tests): order process-outer by hand — same
        # DCN-outer/ICI-inner intent, no slice metadata needed
        devs = sorted(jax.devices(),
                      key=lambda d: (d.process_index, d.id))
        arr = np.asarray(devs).reshape(n_proc, per_proc)
    return Mesh(arr.reshape((arr.size,) + (1,) * (len(axis_names) - 1)),
                tuple(axis_names))


def put_global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Build batch-sharded global arrays from per-process local data.

    Single-process this is shard_batch; multi-host each process passes
    its own slice of the global batch (global_batch = concat of process
    slices in process order) and the result is a global jax.Array the
    pjit-ted train step consumes without any host gathers.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), batch)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in a pytree with its batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters / optimizer state) over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
