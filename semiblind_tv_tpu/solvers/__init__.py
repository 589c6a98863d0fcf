from semiblind_tv_tpu.solvers.salsa import SALSAResult, salsa_tv, soft_threshold  # noqa: F401
