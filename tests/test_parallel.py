"""Multi-chip SPMD tests on the 8-device virtual CPU mesh.

Asserts the SURVEY §4 requirement: psum-reduced SAPG trajectories are
invariant to the sharding layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semiblind_tv_tpu.parallel.mesh import make_mesh
from semiblind_tv_tpu.parallel.sapg_parallel import run_sapg_sharded
from semiblind_tv_tpu.runtime import build_problem, gaussian_preset
from semiblind_tv_tpu.utils import synthetic_wheel

SIZE = 32


def _problems(n, cfg=None, dtype=jnp.float64):
    cfg = cfg or gaussian_preset(fix_w1=False, fix_w2=False)
    img = synthetic_wheel(SIZE)
    keys = jax.random.split(jax.random.key(0), n)
    return [build_problem(img, cfg, keys[i], dtype=dtype) for i in range(n)]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_chains_sharding_invariance():
    """Same 8 total chains on (1,8) / (1,4)x2 / (1,1)x8 layouts -> same
    hyperparameter trajectory (per-chain RNG keys, psum'd stats)."""
    probs = _problems(1)
    key = jax.random.key(42)
    traces = []
    for devs, per_shard in [(8, 1), (4, 2), (1, 8)]:
        mesh = make_mesh(data=1, chains=devs, devices=jax.devices()[:devs])
        _, thetas = run_sapg_sharded(probs, mesh, key, chains_per_shard=per_shard, n_steps=8)
        traces.append(thetas)
    np.testing.assert_allclose(traces[0], traces[1], rtol=1e-9)
    np.testing.assert_allclose(traces[0], traces[2], rtol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_axis_independent_problems():
    """2 independent problems on a (2,4) mesh: each data shard keeps its own
    hyperparameter trajectory."""
    probs = _problems(2)
    mesh = make_mesh(data=2, chains=4)
    state, thetas = run_sapg_sharded(probs, mesh, jax.random.key(7), 1, n_steps=5)
    assert thetas.shape == (2, 5)
    assert np.all(np.isfinite(thetas))
    # different noise realisations -> different trajectories
    assert not np.allclose(thetas[0], thetas[1])
    assert state["X"].shape == (2, 4, SIZE, SIZE)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, (carry, ii) = __graft_entry__.entry()
    out_carry, trace = jax.jit(fn)(carry, ii)
    jax.block_until_ready(trace["theta"])
    assert np.isfinite(float(trace["theta"]))
