#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/reproduce_table.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from insenticap_model_tpu.cli.reproduce_table import main  # noqa: E402

if __name__ == "__main__":
    main()
