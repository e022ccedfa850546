from tpu_pose.parallel import eval, mesh  # noqa: F401,A004
from tpu_pose.parallel.mesh import make_mesh, shard_batch  # noqa: F401
