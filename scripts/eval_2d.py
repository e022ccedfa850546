#!/usr/bin/env python
"""2D-detector PCKh benchmark over npz shards.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/eval_2d.py (also installed as the `tpu-pose-eval-2d`
console command); this file keeps the documented
`python scripts/eval_2d.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.eval_2d import run  # noqa: E402

if __name__ == "__main__":
    run()
