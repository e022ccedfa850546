from tpu_pose.ops import preprocess, softargmax  # noqa: F401
