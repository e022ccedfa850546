from tpu_pose.utils import config, metrics, viz  # noqa: F401
