#!/usr/bin/env python
"""Single-image / video demo of the fused pipeline.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/demo.py (also installed as the `tpu-pose-demo`
console command); this file keeps the documented
`python scripts/demo.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.demo import run  # noqa: E402

if __name__ == "__main__":
    run()
