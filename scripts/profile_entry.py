#!/usr/bin/env python
"""Profile an entry point: wall time, XLA cost model, MFU, trace.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/profile_entry.py (also installed as the
`tpu-pose-profile` console command); this file keeps the documented
`python scripts/profile_entry.py ...` invocation working from a git
checkout without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.profile_entry import run  # noqa: E402

if __name__ == "__main__":
    run()
