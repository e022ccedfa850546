from tpu_pose.models import camera, joints, smpl, smpl_data  # noqa: F401
