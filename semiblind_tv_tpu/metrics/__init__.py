from semiblind_tv_tpu.metrics.metrics import (  # noqa: F401
    mse_db,
    psnr,
    snr,
    l2_spectral_sq,
    ssim,
)
