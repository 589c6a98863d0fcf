"""Checkpoint / results persistence.

The reference's de-facto checkpoint format is the end-of-run `results`
struct saved as .mat (full iterate traces + last sample + options —
SAPG_algorithm_Guassian.m:250-306, SALSA/runStats.m).  Here:

  * `save_results` / `load_results` — the same schema as compressed NPZ.
  * `SAPGCheckpoint` — mid-run checkpointing of the scan carry
    (chain states, hyperparameters, PRNG key, iteration) so a long SAPG run
    can resume after preemption; the reference has no mid-run checkpointing
    (SURVEY.md §5) so this is a new capability, not a port.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["save_results", "load_results", "save_carry", "load_carry", "run_stats"]


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


def save_carry(path: str, carry, step: int) -> None:
    """Checkpoint a SAPG scan carry (pytree of arrays) mid-run."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    np.savez_compressed(path, **arrays)
    with open(path + ".tree", "w") as f:
        f.write(str(treedef))


def load_carry(path: str, like_carry):
    """Restore a carry checkpointed by save_carry, using `like_carry` for the
    pytree structure."""
    leaves, treedef = jax.tree_util.tree_flatten(like_carry)
    with np.load(path) as z:
        step = int(z["__step__"])
        new_leaves = [z[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), step


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
