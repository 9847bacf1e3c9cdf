#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/serve.py (dynamic-batching
HTTP captioning daemon over the batched beam-search hot path)."""
from insenticap_model_tpu.cli.serve import main

if __name__ == "__main__":
    main()
