#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/eval_metrics.py."""
from insenticap_model_tpu.cli.eval_metrics import main

if __name__ == "__main__":
    main()
