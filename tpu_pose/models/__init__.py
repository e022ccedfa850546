from tpu_pose.models import camera, cpm, joints, smpl, smpl_data  # noqa: F401
