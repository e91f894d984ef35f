"""Thin wrapper around the packaged CLI (raytrace_tpu/cli.py) so the example
path keeps working:

    python examples/render_pbrt.py examples/cornell.pbrt -o /tmp/out.png
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytrace_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
