"""Checkpoint/resume via Orbax (SURVEY.md section 5 checkpoint contract).

Replaces the reference's rank-0 torch.save of
{epoch, model_state_dict, optimizer_state_dict, lr_scheduler, losses, lrs}
(reference train_neurons.py:48-61) with an Orbax checkpoint of the same
logical content: {params, opt_state, step, epoch, metrics_history}. Tags
mirror the reference (`brain_model`, `brain_model_prior`, `*_last`) and
best-metric gating is the caller's job (reference :629-636). Orbax writes
are atomic and multi-host safe, which also covers preemptible-TPU recovery
(the reference has none).

Partial loading (`restore_into`) reproduces the reference's strict=False
layered-ensemble loading: any params present in the checkpoint override the
target tree, missing ones keep their initialization.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_ckpt(directory: str, tag: str, *, params: Any, opt_state: Any = None,
              step: int = 0, epoch: int = 0,
              extra: Optional[Dict] = None) -> str:
    """Write a checkpoint (host 0 only under multihost)."""
    if jax.process_index() != 0:
        return os.path.join(directory, tag)
    path = os.path.abspath(os.path.join(directory, tag))
    # store host numpy so restore needs no sharding spec; the trainer
    # re-places restored params onto its mesh
    to_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
    params = to_np(params)
    opt_state = to_np(opt_state) if opt_state is not None else None
    payload = {"params": params, "step": np.asarray(step),
               "epoch": np.asarray(epoch)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload["extra"] = extra
    _checkpointer().save(path, payload, force=True)
    return path


def load_ckpt(directory: str, tag: str, template: Any = None,
              host: bool = False) -> Dict:
    """Load a checkpoint; with `template` (a payload-shaped pytree —
    live arrays or `jax.ShapeDtypeStruct`s) Orbax restores INTO that
    structure, which is how NamedTuple-typed optimizer states
    round-trip. `host=True` returns host numpy leaves (no device
    memory touched) — the resume path uses this so a multi-GB restore
    never doubles HBM residency against a live init state
    (training/loop.py:_restore_state)."""
    path = os.path.abspath(os.path.join(directory, tag))
    if template is not None:
        restored = _checkpointer().restore(path, item=template)
    else:
        restored = _checkpointer().restore(path)
    if host:
        return restored
    # hand back jax arrays: numpy leaves break traced indexing
    # (np_param[traced_idx] calls __array__ on the tracer)
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
        restored)


def metadata_tree(directory: str, tag: str) -> Optional[Any]:
    """The on-disk payload structure (nested containers of Orbax
    ArrayMetadata leaves carrying .shape/.dtype) WITHOUT reading any
    array data. Lets the resume path build an exact restore template —
    full-tree vs trained-subtree vs legacy params-only payloads are
    distinguished up front instead of by try/except over data reads.
    Returns None when the metadata API is unavailable (orbax drift)."""
    path = os.path.abspath(os.path.join(directory, tag))
    try:
        md = _checkpointer().metadata(path)
        return md.item_metadata.tree
    except Exception:
        return None


def shape_template(md_subtree: Any) -> Any:
    """ArrayMetadata tree -> jax.ShapeDtypeStruct tree (host restore
    template; see metadata_tree)."""
    return jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), md_subtree)


def restore_into(target_params: Any, ckpt_params: Any) -> Any:
    """strict=False layering (reference train_neurons.py:211,221,231):
    overlay checkpoint subtrees onto the target, keeping unmatched target
    leaves."""

    def overlay(target, ckpt):
        if isinstance(target, dict) and isinstance(ckpt, dict):
            out = dict(target)
            for k, v in ckpt.items():
                if k in target:
                    out[k] = overlay(target[k], v)
            return out
        return ckpt if ckpt is not None else target

    return overlay(target_params, ckpt_params)


def merge_overlays(*overlays: Any) -> Any:
    """Deep-merge partial param trees; later overlays win on conflicting
    leaves. Unlike `restore_into`, keys absent from earlier trees are
    KEPT — use this to compose several strict=False checkpoint layers
    (MindEye2 backbone, then a stage-1 ckpt, then the coco clipproj —
    reference train_neurons.py:208-241) before overlaying the result
    onto full init params."""

    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            for k, v in b.items():
                out[k] = merge(a[k], v) if k in a else v
            return out
        return b

    result: Any = {}
    for o in overlays:
        if o is not None:
            result = merge(result, o)
    return result or None


def exists(directory: str, tag: str) -> bool:
    return os.path.isdir(os.path.join(directory, tag))


class AsyncCkptWriter:
    """Overlap checkpoint device->host fetch + Orbax write with compute.

    `submit` snapshots the payload ON DEVICE (a cheap HBM copy, so the
    training loop's donated buffers can be rewritten immediately) and a
    single daemon thread performs the device->host fetch and the Orbax
    write in the background. Same role as orbax's AsyncCheckpointer,
    built over `save_ckpt` so the payload/tag dialect stays in one
    place.

    Why this exists: a synchronous `save_ckpt` blocks the step loop for
    the full device->host fetch. On hosts where D2H bandwidth is slow
    relative to the checkpoint size (this harness's tunneled TPU
    measures 12-30 MB/s, so multi-GB saves cost minutes), that tax
    repeats every improving epoch; overlapped, it disappears into the
    epoch compute. Ordering: the single writer thread serializes all
    submissions, so a later save to the same tag always lands last. A
    bounded queue (2) provides backpressure if the writer falls behind.
    Call `drain()` before any SYNCHRONOUS save to the same tag (e.g.
    the end-of-training full-state save) and at loop exit; it re-raises
    the first writer error.
    """

    def __init__(self, max_pending: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            directory, tag, payload = item
            try:
                save_ckpt(directory, tag, **payload)
            except BaseException as e:  # noqa: BLE001 — surfaced in drain
                if self._err is None:
                    self._err = e
            finally:
                self._q.task_done()

    @staticmethod
    def _snapshot(tree: Any) -> Any:
        import jax.numpy as jnp

        return jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
            tree)

    def submit(self, directory: str, tag: str, *, params: Any,
               opt_state: Any = None, step: int = 0, epoch: int = 0,
               extra: Optional[Dict] = None) -> None:
        """Snapshot on device and enqueue the write. Blocks only if
        `max_pending` writes are already queued (backpressure). A prior
        writer error is raised here but stays set until `drain()`
        successfully reports it — a caller that swallows the submit-time
        raise cannot lose the failure."""
        if self._err is not None:
            raise self._err
        payload = {"params": self._snapshot(params),
                   "opt_state": (self._snapshot(opt_state)
                                 if opt_state is not None else None),
                   "step": step, "epoch": epoch, "extra": extra}
        self._q.put((directory, tag, payload))

    def drain(self) -> None:
        """Block until every queued write completed; re-raise (and only
        then clear) the first writer error."""
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self) -> None:
        self.drain()
        self._q.put(None)
        self._thread.join(timeout=60)

    def abort(self) -> None:
        """Non-draining shutdown for exception paths: drop queued
        snapshots (freeing their on-device copies) and stop the writer
        thread without blocking on pending writes. The training loops
        call this from their `except` path so an epoch-loop crash does
        not leak the daemon thread or HBM held by queued snapshots."""
        import queue

        try:
            while True:
                self._q.get_nowait()
                self._q.task_done()
        except queue.Empty:
            pass
        try:
            self._q.put_nowait(None)
        except queue.Full:
            pass
        self._thread.join(timeout=10)
