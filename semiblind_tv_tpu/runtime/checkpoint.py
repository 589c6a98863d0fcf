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
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import numpy as np

__all__ = ["save_results", "load_results", "run_stats"]


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
