#!/usr/bin/env python
"""Reference-parity certification and config sweep.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/parity_sweep.py (also installed as the `tpu-pose-parity-sweep`
console command); this file keeps the documented
`python scripts/parity_sweep.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.parity_sweep import run  # noqa: E402

if __name__ == "__main__":
    run()
