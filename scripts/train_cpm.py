#!/usr/bin/env python
"""Train the CPM detector on synthetic data.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/train_cpm.py (also installed as the `tpu-pose-train-cpm`
console command); this file keeps the documented
`python scripts/train_cpm.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.train_cpm import run  # noqa: E402

if __name__ == "__main__":
    run()
