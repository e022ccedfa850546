#!/usr/bin/env python
"""Multi-seed tracked-video benchmark (crossing / k3 / enter-leave).

Repo-checkout shim: the implementation lives in
tpu_pose/tools/track_bench.py (also installed as the
`tpu-pose-track-bench` console command); this file keeps the documented
`python scripts/track_bench.py ...` invocation working from a git
checkout without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.track_bench import run  # noqa: E402

if __name__ == "__main__":
    run()
