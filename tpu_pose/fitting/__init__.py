from tpu_pose.fitting import energy, fit, priors, temporal  # noqa: F401
from tpu_pose.fitting.fit import (  # noqa: F401
    FitResult,
    fit_smpl_batch,
    fit_smpl_single,
)
from tpu_pose.fitting.temporal import fit_video  # noqa: F401
