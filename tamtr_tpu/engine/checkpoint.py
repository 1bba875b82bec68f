"""Checkpoint save/resume (orbax pytrees; the reference's `.pt` dicts).

The reference pickles {epoch, best_fitness, model+EMA halves, optimizer,
train_args, ...} (`engine/trainer.py:422-447`) and resumes via
`check_resume`/`resume_training` (`trainer.py:568-622`). Here the whole
TrainState is one pytree; orbax handles multi-host writes natively.
Layout: <run_dir>/weights/{last,best}/ + a small metadata json.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(
    path: str | Path,
    state,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    # single-host: materialize on host FIRST (one device_get), then write
    # from numpy. Streaming device arrays straight into tensorstore has been
    # observed to fail mid-commit on tunneled runtimes (OCDBT rename races
    # that wedge orbax's commit futures and hang wait_until_finished);
    # multi-host keeps the native orbax path (per-host shard writes).
    if jax.process_count() == 1:
        state = jax.device_get(state)
    last_err = None
    for attempt in range(2):
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, state, force=True)
            ckptr.wait_until_finished()
            last_err = None
            break
        except Exception as e:  # retry once; orbax tmp dirs can be left dirty
            last_err = e
            import shutil

            for junk in path.parent.glob(path.name + "*orbax-checkpoint-tmp*"):
                shutil.rmtree(junk, ignore_errors=True)
    if last_err is not None:
        # loud fallback: flat npz of the state tree (AutoBackend can read it)
        from tamtr_tpu.utils.log import LOGGER

        npz = path.parent / (path.name + ".npz")
        LOGGER.warning(
            f"orbax save failed twice ({last_err}); falling back to {npz}"
        )
        import re

        import numpy as np

        flat = {
            re.sub(r"[\[\]'\".]+", "/", jax.tree_util.keystr(kp)).strip("/"): np.asarray(leaf)
            for kp, leaf in jax.tree_util.tree_flatten_with_path(state)[0]
            if hasattr(leaf, "shape")
        }
        np.savez(npz, **flat)
    if metadata is not None:
        (path.parent / (path.name + ".meta.json")).write_text(json.dumps(metadata))


def _key_tuple(kp) -> Tuple[str, ...]:
    return tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in kp)


def _fit_to_target(raw, target):
    """Adapt a raw restored pytree to `target`'s leaf shapes.

    Migration path for flat-vector padding changes (PAD_MULTIPLE): 1-D
    leaves shorter than the target are zero-padded (the pad region is
    semantically inert — masks False, grads 0), longer ones sliced. Leaves
    are matched by key path (attr/dict names align between TrainState and
    orbax's raw dict form).
    """
    import numpy as np

    raw_map = {
        _key_tuple(kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(raw)[0]
    }

    def fit(kp, tgt):
        key = _key_tuple(kp)
        if key not in raw_map:
            raise KeyError(f"checkpoint missing leaf {'/'.join(key)}")
        leaf = np.asarray(raw_map[key])
        if leaf.ndim == 1 and getattr(tgt, "ndim", None) == 1 and leaf.shape != tuple(tgt.shape):
            n = int(tgt.shape[0])
            if leaf.shape[0] < n:
                leaf = np.concatenate([leaf, np.zeros((n - leaf.shape[0],), leaf.dtype)])
            else:
                leaf = leaf[:n]
        if hasattr(tgt, "dtype"):
            leaf = leaf.astype(tgt.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fit, target)


def load_checkpoint(path: str | Path, target) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of `target` (an abstract or concrete state).

    Checkpoints written before a flat-vector padding change (PAD_MULTIPLE)
    carry differently-sized (P,) vectors; those are zero-padded / sliced to
    the target length instead of failing the restore.
    """
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    try:
        state = ckptr.restore(path, target)
    except Exception:
        raw = ocp.StandardCheckpointer().restore(path)
        state = _fit_to_target(raw, target)
    meta_path = path.parent / (path.name + ".meta.json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta


def strip_for_inference(state) -> Dict[str, Any]:
    """EMA weights only (the reference's `strip_optimizer`); unravels flat
    parameter vectors into the model tree."""
    p = state.ema_params
    unr = getattr(state, "unravel", None)
    if unr is not None and hasattr(p, "ndim") and p.ndim == 1:
        p = unr(p)
    return {"params": p, "batch_stats": state.ema_batch_stats}


class InferenceState:
    """Duck-typed TrainState carrying only the weights needed for eval."""

    def __init__(self, params, batch_stats, ema_params=None, ema_batch_stats=None,
                 unravel=None):
        self.params = params
        self.batch_stats = batch_stats
        self.ema_params = ema_params if ema_params is not None else params
        self.unravel = unravel
        self.ema_batch_stats = (
            ema_batch_stats if ema_batch_stats is not None else batch_stats
        )


def load_checkpoint_raw(path: str | Path) -> Tuple[InferenceState, Dict[str, Any]]:
    """Restore a checkpoint without a target template (raw pytree)."""
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(path)
    state = InferenceState(
        params=raw.get("params"),
        batch_stats=raw.get("batch_stats"),
        ema_params=raw.get("ema_params"),
        ema_batch_stats=raw.get("ema_batch_stats"),
    )
    meta_path = path.parent / (path.name + ".meta.json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta
