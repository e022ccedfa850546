from tpu_pose.fitting import (  # noqa: F401
    energy,
    fit,
    interpenetration,
    priors,
    temporal,
)
from tpu_pose.fitting.fit import (  # noqa: F401
    FitResult,
    fit_smpl_batch,
    fit_smpl_single,
)
from tpu_pose.fitting.temporal import fit_video  # noqa: F401
