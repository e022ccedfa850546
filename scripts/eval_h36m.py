#!/usr/bin/env python
"""Dataset-scale 3D evaluation (H3.6M protocols).

Repo-checkout shim: the implementation lives in
tpu_pose/tools/eval_h36m.py (also installed as the `tpu-pose-eval-h36m`
console command); this file keeps the documented
`python scripts/eval_h36m.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.eval_h36m import run  # noqa: E402

if __name__ == "__main__":
    run()
