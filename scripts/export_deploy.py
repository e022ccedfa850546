#!/usr/bin/env python
"""Build, verify, and smoke-run an AOT deployment artifact.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/export_deploy.py (also installed as the `tpu-pose-export-deploy`
console command); this file keeps the documented
`python scripts/export_deploy.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.export_deploy import run  # noqa: E402

if __name__ == "__main__":
    run()
