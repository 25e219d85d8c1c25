"""Checkpoint save/load + completeness signaling.

Checkpoints double as the trainer→generator message channel (reference
commands/run_train.sh:2-21 design; SURVEY.md §5.4). Directory layout:

    <dir>/checkpoint-<step>/
        params.msgpack       flax-serialized model params
        opt_state.msgpack    optimizer state (optional)
        meta.json            {"step": N, ...extra}
        DONE                 completeness marker, written LAST

The DONE marker replaces the reference's "scheduler.pt exists ⇒ checkpoint
complete" convention (reference run_ann.py:322-331 writes scheduler.pt last;
run_ann_data_gen.py:55-71 only accepts checkpoints that have it) with an
explicit sentinel, fixing the implicit-ordering race noted in SURVEY.md §5.2.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from typing import Any, Optional

import jax
from flax import serialization

DONE_MARKER = "DONE"


def checkpoint_no(path: str) -> int:
    """Trailing integer of a checkpoint dirname
    (reference utils/util.py:224-226)."""
    nums = re.findall(r"\d+", os.path.basename(os.path.normpath(path)))
    return int(nums[-1]) if nums else 0


def save_checkpoint(directory: str, step: int, params: Any,
                    opt_state: Any = None, extra: Optional[dict] = None
                    ) -> str:
    """Write checkpoint-<step>; atomic-ish via temp dir + rename, DONE last."""
    os.makedirs(directory, exist_ok=True)
    final = os.path.join(directory, f"checkpoint-{step}")
    tmp = tempfile.mkdtemp(dir=directory, prefix=f".ckpt-{step}-")
    try:
        with open(os.path.join(tmp, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        if opt_state is not None:
            with open(os.path.join(tmp, "opt_state.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(opt_state)))
        meta = {"step": int(step)}
        meta.update(extra or {})
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    # completeness marker written last (parity: scheduler.pt convention)
    with open(os.path.join(final, DONE_MARKER), "w") as f:
        f.write(str(step))
    return final


def is_complete(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, DONE_MARKER))


def load_checkpoint(ckpt_dir: str, params_template: Any,
                    opt_state_template: Any = None):
    """Load params (and optionally opt state) into given template pytrees.
    Returns (params, opt_state_or_None, meta). Reads both the msgpack
    layout (save_checkpoint) and the orbax layout (AsyncCheckpointer), so
    resume/generator consumers need not care which writer produced it."""
    msgpack_path = os.path.join(ckpt_dir, "params.msgpack")
    if not os.path.exists(msgpack_path):
        return _load_orbax_checkpoint(ckpt_dir, params_template,
                                      opt_state_template)
    with open(msgpack_path, "rb") as f:
        params = serialization.from_bytes(params_template, f.read())
    opt_state = None
    opt_path = os.path.join(ckpt_dir, "opt_state.msgpack")
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = serialization.from_bytes(opt_state_template, f.read())
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    return params, opt_state, meta


def load_raw_params(ckpt_dir: str) -> Any:
    """Template-free params restore (nested dicts of host arrays).

    For warm-starting a DIFFERENT model family than the one that wrote the
    checkpoint — e.g. grafting a pretrained SEED MLM encoder onto the
    seeddot fine-tuning model (the reference's pretrain→fine-tune handoff,
    README.md:83-87) — where no matching template pytree exists."""
    msgpack_path = os.path.join(ckpt_dir, "params.msgpack")
    if os.path.exists(msgpack_path):
        with open(msgpack_path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    import orbax.checkpoint as ocp
    state_dir = os.path.join(ckpt_dir, "state")
    with ocp.StandardCheckpointer() as ckptr:
        if os.path.isdir(state_dir):
            return ckptr.restore(os.path.abspath(state_dir))["params"]
        return ckptr.restore(
            os.path.abspath(os.path.join(ckpt_dir, "params")))


def _load_orbax_checkpoint(ckpt_dir: str, params_template: Any,
                           opt_state_template: Any = None):
    """Orbax layouts: ``state/`` composite ({"params", "opt_state"?}) from
    the async writer, or the legacy ``params/`` item."""
    import orbax.checkpoint as ocp
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    state_dir = os.path.join(ckpt_dir, "state")
    with ocp.StandardCheckpointer() as ckptr:
        if os.path.isdir(state_dir):
            if opt_state_template is not None and meta.get("has_opt_state"):
                restored = ckptr.restore(
                    os.path.abspath(state_dir),
                    target={"params": params_template,
                            "opt_state": opt_state_template})
                return restored["params"], restored["opt_state"], meta
            restored = ckptr.restore(os.path.abspath(state_dir))
            return restored["params"], None, meta
        params = ckptr.restore(
            os.path.abspath(os.path.join(ckpt_dir, "params")),
            target=params_template)
    return params, None, meta


class AsyncCheckpointer:
    """Orbax-backed async checkpoint writer (non-blocking; the save runs in a
    background thread while training continues — the TPU-native analogue of
    the reference's rank-0 save fence, run_warmup.py:222-244).

    Falls back to synchronous :func:`save_checkpoint` when orbax is
    unavailable, AND in multi-process runs: orbax's save/wait_until_finished
    issue sync_global_processes barriers that every process must join, but
    the rank-0-only save convention (reference run_ann.py:307-334) calls
    them on process 0 alone — process 0 would hang at the first barrier.
    The sync msgpack path has no collectives (params/opt_state are
    replicated, so rank 0's device_get sees the full arrays), so rank-0-only
    stays correct. The DONE marker is written by a completion callback so
    the completeness protocol is identical in both modes.
    """

    def __init__(self, directory: str):
        self.directory = directory
        self._ckptr = None
        try:
            import orbax.checkpoint as ocp
            if jax.process_count() == 1:
                self._ckptr = ocp.AsyncCheckpointer(
                    ocp.StandardCheckpointHandler())
                self._ocp = ocp
        except Exception:
            self._ckptr = None

    def save(self, step: int, params: Any, opt_state: Any = None,
             extra: Optional[dict] = None) -> str:
        """Start a non-blocking save (device→host copy is synchronous —
        safe alongside donating train steps — the disk write is not).
        Call :meth:`wait` before relying on the checkpoint or starting
        another save."""
        final = os.path.join(self.directory, f"checkpoint-{step}")
        if self._ckptr is None:
            return save_checkpoint(self.directory, step, params,
                                   opt_state=opt_state, extra=extra)
        os.makedirs(self.directory, exist_ok=True)
        if os.path.exists(final):
            shutil.rmtree(final)
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        self._ckptr.save(os.path.abspath(os.path.join(final, "state")),
                         args=self._ocp.args.StandardSave(payload))
        self._pending = (final, step, extra, opt_state is not None)
        return final

    def wait(self) -> None:
        """Block until the in-flight save lands, then publish meta + DONE."""
        if self._ckptr is None:
            return
        self._ckptr.wait_until_finished()
        if getattr(self, "_pending", None):
            final, step, extra, has_opt = self._pending
            meta = {"step": int(step), "format": "orbax",
                    "has_opt_state": has_opt}
            meta.update(extra or {})
            with open(os.path.join(final, "meta.json"), "w") as f:
                json.dump(meta, f)
            with open(os.path.join(final, DONE_MARKER), "w") as f:
                f.write(str(step))
            self._pending = None

    def restore(self, ckpt_dir: str, params_template: Any):
        # load_checkpoint dispatches on layout (msgpack / orbax state/ /
        # legacy orbax params/)
        return load_checkpoint(ckpt_dir, params_template)[0]


def resume_train_state(training_dir: str, state):
    """Restore the newest COMPLETE checkpoint into a TrainState.

    Shared by warmup resume (cli.cmd_warmup) and the pipelined loop
    (PipelinedAnce.resume) so checkpoint-layout changes are reasoned
    through once. Returns ``(state, step, meta)`` — ``(state, 0, {})``
    unchanged when nothing complete exists. Multi-host note: assumes a
    shared filesystem (rank 0 writes, every rank reads — the reference's
    convention too, run_ann.py:307-334); on disjoint filesystems only
    rank 0 would find the checkpoint and ranks would diverge."""
    import jax.numpy as jnp
    from ance_tpu.train.trainer import TrainState
    path, step = get_latest_checkpoint(training_dir or "")
    if path is None or not is_complete(path):
        return state, 0, {}
    params, opt_state, meta = load_checkpoint(
        path, state.params, getattr(state, "opt_state", None))
    new_state = TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                           opt_state=opt_state if opt_state is not None
                           else state.opt_state)
    return new_state, step, (meta or {})


def get_latest_checkpoint(training_dir: str,
                          init_model_dir: Optional[str] = None
                          ) -> tuple[Optional[str], int]:
    """Newest COMPLETE checkpoint dir, else (init_model_dir, 0)
    (reference run_ann_data_gen.py:55-71)."""
    if not os.path.isdir(training_dir):
        return init_model_dir, 0
    best_step, best_path = -1, None
    for name in next(os.walk(training_dir))[1]:
        path = os.path.join(training_dir, name)
        if not is_complete(path):
            continue
        step = checkpoint_no(name)
        if step > best_step:
            best_step, best_path = step, path
    if best_path is None:
        return init_model_dir, 0
    return best_path, best_step
