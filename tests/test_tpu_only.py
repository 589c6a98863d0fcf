"""Tests that require a real TPU backend (skipped on the CPU CI mesh).

Run manually on the chip:  python -m pytest tests/test_tpu_only.py -q
(without the conftest CPU forcing: JAX_TPU_TESTS=1 env opts in)
"""
import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("JAX_TPU_TESTS") != "1",
    reason="set JAX_TPU_TESTS=1 and run on a TPU backend",
)


@requires_tpu
def test_fused_step_bit_identical():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "axon,tpu,cpu")
    from semiblind_tv_tpu.ops.fused_step_pallas import myula_prox_tv
    from semiblind_tv_tpu.ops.tv import chambolle_prox, tv_norm
    from semiblind_tv_tpu.samplers.myula import myula_kernel_step

    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.uniform(ks[0], (256, 256), jnp.float32) * 255
    prox_c = x + jax.random.normal(ks[1], (256, 256)) * 0.1
    gradf = jax.random.normal(ks[2], (256, 256)) * 0.01
    z = jax.random.normal(ks[3], (256, 256))
    g, l, lt = jnp.float32(1.9), jnp.float32(2.0), jnp.float32(0.02)

    xn_f, proxn_f, tv_f = myula_prox_tv(x, prox_c, gradf, z, g, l, lt, 25)
    xn_r = myula_kernel_step(x, prox_c, gradf, g, l, z, True)
    proxn_r, _ = chambolle_prox(xn_r, lt, 25)
    assert float(jnp.max(jnp.abs(xn_f - xn_r))) == 0.0
    assert float(jnp.max(jnp.abs(proxn_f - proxn_r))) == 0.0
    np.testing.assert_allclose(float(tv_f), float(tv_norm(xn_r)), rtol=1e-5)


@requires_tpu
def test_pallas_chambolle_bit_identical():
    import jax
    import jax.numpy as jnp

    from semiblind_tv_tpu.ops.tv import chambolle_prox
    from semiblind_tv_tpu.ops.tv_pallas import chambolle_prox_pallas

    x = jax.random.normal(jax.random.key(0), (256, 256), jnp.float32) * 10
    f1, st1 = chambolle_prox(x, jnp.float32(0.5), 25)
    f2, st2 = chambolle_prox_pallas(x, jnp.float32(0.5), 25)
    assert float(jnp.max(jnp.abs(f1 - f2))) == 0.0
