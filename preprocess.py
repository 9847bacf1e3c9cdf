#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/preprocess.py (stage-subcommand
version of the reference's preprocess.py)."""
from insenticap_model_tpu.cli.preprocess import main

if __name__ == "__main__":
    main()
