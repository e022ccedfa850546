#!/usr/bin/env python
"""Hard-set training-scale study + distractor A/B trainer.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/hard_sweep.py (also installed as the `tpu-pose-hard-sweep`
console command); this file keeps the documented
`python scripts/hard_sweep.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.hard_sweep import run  # noqa: E402

if __name__ == "__main__":
    run()
