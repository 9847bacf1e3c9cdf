#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/convert_checkpoint.py."""
from insenticap_model_tpu.cli.convert_checkpoint import main

if __name__ == "__main__":
    main()
