"""Checkpoint / results persistence.

The reference's de-facto checkpoint format is the end-of-run `results`
struct saved as .mat (full iterate traces + last sample + options —
SAPG_algorithm_Guassian.m:250-306, SALSA/runStats.m).  Here:

  * `save_results` / `load_results` — the same schema as compressed NPZ.
  * Mid-run checkpoint/resume of the SAPG scan carry lives with the
    estimator (`sapg/estimator.py::_save_checkpoint`/`_restore_checkpoint`,
    driven by run_sapg's checkpoint_every/checkpoint_path); the reference
    has no mid-run checkpointing (SURVEY.md §5) so that is a new
    capability, not a port.
  * `save_checkpoint_arrays` / `load_checkpoint_arrays` — the persistence
    layer under the mid-run checkpoint: a flat {name: ndarray} dict written
    either as portable NPZ (default) or through **Orbax**
    (`backend="orbax"`), whose async multi-host-coordinated writes are the
    right choice under `jax.distributed` (every process must then call
    save on the same path, as with any orbax save).
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict

import numpy as np

__all__ = [
    "save_results",
    "load_results",
    "run_stats",
    "save_checkpoint_arrays",
    "load_checkpoint_arrays",
    "delete_checkpoint",
]

_ORBAX_CHECKPOINTER = None


def _orbax():
    global _ORBAX_CHECKPOINTER
    if _ORBAX_CHECKPOINTER is None:
        import orbax.checkpoint as ocp

        _ORBAX_CHECKPOINTER = ocp.StandardCheckpointer()
    return _ORBAX_CHECKPOINTER


def save_checkpoint_arrays(path: str, arrays: Dict[str, np.ndarray], backend: str = "npz") -> None:
    """Atomically persist a flat dict of host arrays as NPZ or an Orbax dir."""
    if backend == "npz":
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)
    elif backend == "orbax":
        ckptr = _orbax()
        ckptr.save(os.path.abspath(path), arrays, force=True)
        if hasattr(ckptr, "wait_until_finished"):
            ckptr.wait_until_finished()
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r} (npz|orbax)")


def load_checkpoint_arrays(path: str, backend: str | None = None) -> Dict[str, np.ndarray]:
    """Load a checkpoint dict; backend auto-detected from the path when None
    (directory → orbax, file → npz)."""
    if backend is None:
        backend = "orbax" if os.path.isdir(path) else "npz"
    if backend == "npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    restored = _orbax().restore(os.path.abspath(path))
    return {k: np.asarray(v) for k, v in restored.items()}


def delete_checkpoint(path: str) -> None:
    """Remove a checkpoint regardless of backend (file or directory)."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def save_results(path: str, sapg, salsa=None) -> None:
    """Persist an SAPGResult (+ optional SALSAResult) as NPZ."""
    arrays: Dict[str, Any] = {}
    for f in dataclasses.fields(sapg):
        v = getattr(sapg, f.name)
        if isinstance(v, np.ndarray):
            arrays[f"sapg/{f.name}"] = v
        elif isinstance(v, dict):
            for k, vv in v.items():
                arrays[f"sapg/{f.name}/{k}"] = np.asarray(vv)
        else:
            arrays[f"sapg/scalar/{f.name}"] = np.asarray(v)
    if salsa is not None:
        for f in dataclasses.fields(salsa):
            v = getattr(salsa, f.name)
            if isinstance(v, dict):
                arrays[f"salsa/{f.name}"] = np.asarray(json.dumps(v))
            else:
                arrays[f"salsa/{f.name}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_results(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def run_stats(directory: str) -> Dict[str, float]:
    """Aggregate a directory of results.json files (reference SALSA/runStats.m:
    averages MSE and time over *_results.mat in a results dir)."""
    mses, times, ssims = [], [], []
    for name in sorted(os.listdir(directory)):
        sub = os.path.join(directory, name)
        path = sub if name.endswith(".json") else os.path.join(sub, "results.json")
        if os.path.isfile(path):
            with open(path) as f:
                r = json.load(f)
            if "mse_db" in r:
                mses.append(r["mse_db"])
            if "sapg_time_s" in r:
                times.append(r["sapg_time_s"])
            if "ssim" in r:
                ssims.append(r["ssim"])
    out: Dict[str, float] = {"count": float(len(mses))}
    if mses:
        out["mse_avg"] = float(np.mean(mses))
        out["mse_std"] = float(np.std(mses))
    if times:
        out["time_avg"] = float(np.mean(times))
    if ssims:
        out["ssim_avg"] = float(np.mean(ssims))
    return out
