from tpu_pose.utils import config, metrics  # noqa: F401
