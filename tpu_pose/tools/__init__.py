"""Command-line tools (installed as ``tpu-pose-*`` console commands;
also runnable as ``python -m tpu_pose.tools.<name>`` or via the
``scripts/<name>.py`` repo shims).

Each module defines its absl flags at import time — import at most one
per process (the console entry points and shims do).
"""
