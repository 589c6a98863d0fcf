from semiblind_tv_tpu.sapg.estimator import SAPGResult, run_sapg  # noqa: F401
