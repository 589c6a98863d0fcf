from semiblind_tv_tpu.utils.images import load_image, synthetic_wheel, available_images  # noqa: F401
