"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's distributed substrate (HF
Accelerate over torch.distributed/NCCL; reference train_neurons.py:668,
scripts/neuroclips_video.py:39-40). Instead of DDP process groups we build a
named `jax.sharding.Mesh` and let GSPMD insert the collectives (all-reduce
for gradients over the `data` axis, all-gathers for any tensor-parallel
axes) over ICI.

Axes (see config.MeshConfig):
  data  — batch (DP): gradients psum over this axis automatically.
  model — tensor parallel for wide linears / attention heads.
  frame — temporal axis of video tensors (motion-module attention layout).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurons_tpu.config import MeshConfig


def create_mesh(cfg: MeshConfig = MeshConfig(),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh from the config; `data=-1` absorbs remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    sizes = {"data": cfg.data, "model": cfg.model, "frame": cfg.frame}
    fixed = math.prod(v for v in sizes.values() if v > 0)
    n_free = sum(1 for v in sizes.values() if v <= 0)
    if n_free > 1:
        raise ValueError("at most one mesh axis may be -1")
    if n_free == 1:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        free = n // fixed
        sizes = {k: (free if v <= 0 else v) for k, v in sizes.items()}
    if math.prod(sizes.values()) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes["data"], sizes["model"], sizes["frame"])
    return Mesh(dev_array, axis_names=("data", "model", "frame"))


def local_mesh_size(mesh: Mesh, axis: str = "data") -> int:
    return mesh.shape[axis]


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) axis over `data`, replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays with batch-axis sharding over `data`.

    Replaces the reference's DDP DataLoader sharding: every leaf's axis 0 is
    split across the `data` mesh axis (per-device batch = B / data). Leaves
    whose batch axis is not divisible raise, mirroring drop_last semantics.
    """

    def _put(x):
        if isinstance(x, jax.Array) and not x.is_deleted():
            # already materialized on device (e.g. a batch field computed
            # by an on-device generator): never round-trip it through the
            # host — D2H over a remote-TPU tunnel runs at ~25 MB/s
            # sustained (measured, TRAIN_r04.json wire probe). The caller
            # owns its sharding in that case.
            return x
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. params) over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_sharding(mesh: Mesh, x, axis: str = "data",
                  min_elems: int = 2 ** 16) -> NamedSharding:
    """ZeRO-style sharding spec for one optimizer-state / param leaf:
    shard the largest `axis`-divisible dimension of big leaves over the
    mesh axis, replicate small ones (the reference's commented DeepSpeed
    ZeRO-2 suggestion, train_neurons.py:667 — here a first-class option)."""
    if not hasattr(x, "shape") or np.prod(x.shape or (1,)) < min_elems:
        return replicated_sharding(mesh)
    n = mesh.shape[axis]
    for i, d in sorted(enumerate(x.shape), key=lambda t: -t[1]):
        if d % n == 0:
            spec = [None] * len(x.shape)
            spec[i] = axis
            return NamedSharding(mesh, P(*spec))
    return replicated_sharding(mesh)


def shard_opt_state(mesh: Mesh, opt_state, axis: str = "data"):
    """Place an optax state pytree with ZeRO-style sharding: the moment
    buffers (same shapes as params) dominate optimizer memory; sharding
    them over `data` cuts per-chip optimizer memory by the axis size.
    GSPMD inserts the gathers the update math needs.

    NOTE: when params are themselves TP-sharded, prefer
    `shard_opt_state_like` — moments sharded on a DIFFERENT axis than
    their params force an all-gather + re-shard around every optimizer
    update (XLA memory analysis showed ~15 GB/device of resharding
    temps for the full-size stage-1 step with this function)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, fsdp_sharding(mesh, x, axis))
        if hasattr(x, "shape") else x, opt_state)


def _refine_with_axis(mesh: Mesh, spec, shape, axis: str,
                      min_elems: int = 2 ** 20):
    """Extend a param's PartitionSpec with `axis` on the largest axis
    that still divides evenly (ZeRO refinement on top of TP)."""
    spec = list(spec) + [None] * (len(shape) - len(spec))
    used = set()
    for s in spec:
        if s is not None:
            used.update(s if isinstance(s, tuple) else (s,))
    if axis in used or np.prod(shape or (1,)) < min_elems:
        return P(*spec)
    n = mesh.shape[axis]
    for i, d in sorted(enumerate(shape), key=lambda t: -t[1]):
        cur = spec[i]
        if cur is None:
            if d % n == 0:
                spec[i] = axis
                return P(*spec)
        else:
            axes = cur if isinstance(cur, tuple) else (cur,)
            denom = n * int(np.prod([mesh.shape[a] for a in axes]))
            if d % denom == 0:
                spec[i] = tuple(axes) + (axis,)
                return P(*spec)
    return P(*spec)


def shard_opt_state_like(mesh: Mesh, opt_state, params_sharded,
                         axis: str = "data"):
    """Moment buffers co-sharded with their params (optionally refined
    over `axis` for ZeRO): the optimizer update then reads moments and
    params with the SAME layout — fully local, no GSPMD resharding.

    Matching is by leaf SHAPE (robust to optax's multi_transform /
    masked nesting, where the state tree structure diverges from the
    param tree): any state leaf whose shape equals a param leaf's shape
    adopts that param's sharding; everything else replicates. Params
    sharing a shape with different shardings would be ambiguous — the
    first spec wins (in this framework only the uniquely-shaped wide
    projections carry non-trivial specs)."""
    sharding_of = opt_sharding_fn(mesh, params_sharded, axis)

    def place(x):
        s = sharding_of(x)
        return jax.device_put(x, s) if s is not None else x

    return jax.tree_util.tree_map(place, opt_state)


def opt_sharding_fn(mesh: Mesh, params_sharded, axis: str = "data"):
    """The leaf -> NamedSharding rule `shard_opt_state_like` applies
    (None for non-array leaves), as a callable. `params_sharded` may
    hold real arrays or `ShapeDtypeStruct`s with `.sharding` — the
    latter enables AOT lowering of full-size steps without
    materializing the state."""
    spec_by_shape = {}
    for p in jax.tree_util.tree_leaves(params_sharded):
        sh = getattr(p, "sharding", None)
        spec = sh.spec if isinstance(sh, NamedSharding) else P()
        spec_by_shape.setdefault(tuple(p.shape), spec)

    def sharding_of(x):
        if not hasattr(x, "shape"):
            return None
        spec = spec_by_shape.get(tuple(x.shape), P())
        return NamedSharding(mesh, _refine_with_axis(mesh, spec, x.shape,
                                                     axis))

    return sharding_of


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Overlap host->HBM batch transfer with device compute.

    The TPU-native replacement for the reference's DataLoader worker
    prefetch (num_workers, train_neurons.py prepare_data): a small deque
    of batches is `shard_batch`-transferred AHEAD of consumption, so the
    next batch's DMA rides under the current step's compute. Yields the
    same dicts `shard_batch` would."""
    import collections

    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            batch = next(iterator, None)
            if batch is None:
                return
            queue.append(shard_batch(mesh, batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
