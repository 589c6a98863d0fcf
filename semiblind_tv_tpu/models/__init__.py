from semiblind_tv_tpu.models.psf_models import (  # noqa: F401
    ParamSpec,
    PsfModel,
    GaussianPsfModel,
    IsotropicGaussianPsfModel,
    LaplacePsfModel,
    MoffatPsfModel,
)
