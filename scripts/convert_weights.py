#!/usr/bin/env python
"""Convert a TF CPM checkpoint to the npz params format.

Repo-checkout shim: the implementation lives in
tpu_pose/tools/convert_weights.py (also installed as the `tpu-pose-convert-weights`
console command); this file keeps the documented
`python scripts/convert_weights.py ...` invocation working from a git checkout
without installing the package.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pose.tools.convert_weights import run  # noqa: E402

if __name__ == "__main__":
    run()
