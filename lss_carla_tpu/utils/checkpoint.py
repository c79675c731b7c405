"""Orbax checkpointing with the reference's logical contract.

The reference saves torch dicts ``{model_state_dict, optimizer_state_dict,
counter, epoch[, val_iou]}`` as ``model_{counter:06d}.pt`` / ``model_best.pt``
/ ``model_final.pt`` (``train_simbev.py:417-453``). Here the same contract
maps onto Orbax: each checkpoint stores the full TrainState pytree (params +
opt_state + batch_stats + step) plus a small metadata dict, keyed by the
global step counter; "best" is tracked via metadata and a ``best`` pointer
file. ``resume`` restores state + counter + epoch exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


def ocp_abstract(x):
    """Abstract leaf for orbax restore targets.

    The leaf's sharding rides along whenever the target is a concrete
    ``jax.Array``. Multi-process: mandatory — orbax restores each process's
    addressable shards of the global NamedSharding directly, the only
    correct multi-controller path (the caller pre-places the target state on
    the global mesh before restoring, see ``training/loop.py``). Single
    process: the target's (single-device) sharding lets orbax restore a
    checkpoint written on a DIFFERENT backend — e.g. a TPU-trained
    checkpoint evaluated on CPU — where falling back to the sharding saved
    in the checkpoint would name unavailable devices. Non-array leaves
    (python ints like a fresh state's ``step``, optax counters) get the
    default device's sharding for the same reason: the checkpointed side
    saved them as device arrays."""
    import jax
    import jax.numpy as jnp
    if isinstance(x, jax.Array):
        sharding = x.sharding
    elif jax.process_count() == 1:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    else:
        # multi-controller: device 0 may not be addressable from this
        # process; the caller pre-places every leaf on the global mesh
        # anyway (loop.py), so plain leaves stay sharding-free
        sharding = None
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x),
                                sharding=sharding)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = False):
        """``async_save=True``: periodic saves return after the synchronous
        device->host snapshot and persist in a background thread (orbax async
        checkpointing), so training overlaps the file/object-store write —
        the dominant save cost on real hosts. The background thread does host
        IO only (never enters jax), ``save`` drains any in-flight write
        before starting the next, and best/final saves plus ``restore``/
        ``close`` are drain points, so every durability contract of the sync
        mode is preserved."""
        self.directory = os.path.abspath(directory)
        self.async_save = bool(async_save)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=None, enable_async_checkpointing=self.async_save),
        )
        # best-by-val-IoU checkpoints live in their own manager so the
        # periodic rotation (max_to_keep) can never garbage-collect them
        # (reference keeps model_best.pt forever, train_simbev.py:417-430)
        self._best_mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True,
                enable_async_checkpointing=self.async_save),
        )
        self._best_path = os.path.join(self.directory, "best.json")

    # --- save ---

    def save(self, step: int, state, epoch: int,
             val_iou: Optional[float] = None, mgr=None,
             wait: Optional[bool] = None):
        """``wait`` defaults to the manager mode (sync -> block until
        durable; async -> return once the background write is launched).
        Pass ``wait=True`` to force durability on an async manager (best and
        final saves do)."""
        mgr = mgr or self._mgr
        if self.async_save:
            # one write in flight at a time; also makes the idempotence
            # check below exact (an in-flight step isn't in all_steps() yet)
            mgr.wait_until_finished()
        meta = {"counter": int(step), "epoch": int(epoch)}
        if val_iou is not None:
            meta["val_iou"] = float(val_iou)
        if int(step) in mgr.all_steps():
            # idempotent re-save at the same counter (periodic + final/best
            # can coincide): replace the existing checkpoint. The delete is
            # REQUIRED — orbax raises StepAlreadyExistsError even with
            # force=True (verified empirically). This opens a SIGKILL window
            # in which step N has no checkpoint; acceptable because
            # (a) SIGTERM preemption is handled upstream, and (b) older
            # periodic steps survive (max_to_keep=5) so the run remains
            # resumable from the previous checkpoint. In async mode the
            # replacement commit would otherwise be deferred to the
            # background thread, widening that window to the whole write —
            # so same-step re-saves are forced durable below.
            mgr.delete(int(step))
            wait = True
        mgr.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
            force=True,
        )
        if wait is None:
            wait = not self.async_save
        if wait:
            mgr.wait_until_finished()

    def save_best(self, step: int, state, epoch: int, val_iou: float):
        # best saves block even in async mode: best.json below must never
        # point at a checkpoint that isn't durable yet (they're rare —
        # val-IoU improvements only — so there's nothing to hide them behind)
        self.save(step, state, epoch, val_iou, mgr=self._best_mgr, wait=True)
        import jax
        if jax.process_index() == 0:
            # multihost: orbax already demands a shared checkpoint dir, so
            # process 0's write is visible to every host on resume; writing
            # from all processes would race on the same path
            with open(self._best_path, "w") as f:
                json.dump({"counter": int(step), "epoch": int(epoch),
                           "val_iou": float(val_iou)}, f)

    # --- restore ---

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return int(json.load(f)["counter"])
        return None

    def best_val_iou(self) -> Optional[float]:
        """Best val IoU recorded by ``save_best`` (None if never saved).

        Resume must consult this: periodic/preemption checkpoints carry no
        ``val_iou``, so restoring best-IoU tracking from their meta alone
        would reset it to 0 and let a worse model overwrite the saved best."""
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return float(json.load(f).get("val_iou", 0.0))
        return None

    def restore(self, abstract_state, step: Optional[int] = None,
                best: bool = False) -> Tuple[Any, dict]:
        """Restore (state, meta). ``abstract_state``: a target TrainState (or
        jax.eval_shape of one) defining the tree structure. ``best=True``
        restores the best-by-val-IoU checkpoint."""
        if self.async_save:
            self.wait()  # same-process restore must see in-flight saves
        mgr = self._best_mgr if best else self._mgr
        if step is None:
            step = mgr.latest_step()
        if step is None:
            if not best and self._best_mgr.latest_step() is not None:
                # only a best checkpoint exists (e.g. val-only runs)
                return self.restore(abstract_state, best=True)
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = mgr.restore(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def restore_partial(self, abstract_subtree, step: Optional[int] = None,
                        best: bool = False) -> Tuple[Any, dict]:
        """Restore only the keys present in ``abstract_subtree`` (a dict of
        top-level TrainState fields, e.g. params/batch_stats), ignoring
        whatever else the checkpoint holds — the weights-only path for
        evaluating checkpoints whose optimizer-state structure doesn't
        match this process's optimizer (e.g. a schedule-trained checkpoint
        opened by an eval tool built with the default constant LR)."""
        if self.async_save:
            self.wait()
        mgr = self._best_mgr if best else self._mgr
        if step is None:
            step = mgr.latest_step()
        if step is None:
            if not best and self._best_mgr.latest_step() is not None:
                return self.restore_partial(abstract_subtree, best=True)
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        # standalone checkpointers on the step directory: the manager's
        # composite registry binds item "state" to StandardRestore on first
        # use, and then rejects a PyTreeRestore arg for the same item
        base = os.path.join(self.directory, "best" if best else "",
                            str(int(step)))
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ck:
            state = ck.restore(
                os.path.join(base, "state"),
                args=ocp.args.PyTreeRestore(abstract_subtree,
                                            partial_restore=True))
        with ocp.Checkpointer(ocp.JsonCheckpointHandler()) as ck:
            meta = ck.restore(os.path.join(base, "meta"))
        return state, meta

    def wait(self):
        """Drain in-flight async writes (no-op for sync managers)."""
        self._mgr.wait_until_finished()
        self._best_mgr.wait_until_finished()

    def close(self):
        # orbax close() drains pending async saves before releasing
        self._mgr.close()
        self._best_mgr.close()
