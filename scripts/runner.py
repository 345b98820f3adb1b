#!/usr/bin/env python3
"""Thin repo-checkout wrapper around the packaged CLI (airgym_tpu/cli.py,
installed as the ``airgym-tpu`` console script). Kept so the reference's
``python scripts/runner.py ...`` invocation works from a plain checkout
without installing (reference: scripts/runner.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from airgym_tpu.cli import (  # noqa: E402,F401
    get_args, main, resolve_train, run_cli, update_config)

if __name__ == "__main__":
    main()
