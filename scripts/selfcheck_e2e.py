#!/usr/bin/env python
"""End-to-end self-check ladder (trains + evals everything).

Repo-checkout shim: the implementation lives in
tpu_pose/tools/selfcheck_e2e.py (also installed as the `tpu-pose-selfcheck-e2e`
console command); this file keeps the documented
`python scripts/selfcheck_e2e.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.selfcheck_e2e import run  # noqa: E402

if __name__ == "__main__":
    run()
