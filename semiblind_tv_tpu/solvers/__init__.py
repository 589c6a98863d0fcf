from semiblind_tv_tpu.solvers.salsa import SALSAResult, salsa_tv, soft_threshold  # noqa: F401
from semiblind_tv_tpu.solvers.fista import FISTAResult, fista, fista_tv  # noqa: F401
