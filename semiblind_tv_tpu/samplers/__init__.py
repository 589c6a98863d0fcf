from semiblind_tv_tpu.samplers.myula import myula_kernel_step, myula_sampler  # noqa: F401
