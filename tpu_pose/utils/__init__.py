from tpu_pose.utils import config, metrics, videoio, viz  # noqa: F401
