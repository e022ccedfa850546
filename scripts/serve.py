#!/usr/bin/env python
"""HTTP serving front end for the fused pipeline.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/serve.py (also installed as the `tpu-pose-serve`
console command); this file keeps the documented
`python scripts/serve.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.serve import run  # noqa: E402

if __name__ == "__main__":
    run()
