#!/usr/bin/env python
"""One-command real-asset validation playbook.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/reference_day_one.py (also installed as the `tpu-pose-reference-day-one`
console command); this file keeps the documented
`python scripts/reference_day_one.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.reference_day_one import run  # noqa: E402

if __name__ == "__main__":
    run()
