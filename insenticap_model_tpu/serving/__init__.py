"""Serving layer internals, split by concern (VERDICT r4 next #7):

- ``batching``  — the two-stage dynamic-batching core + bucket ladders +
                  stats/Prometheus rendering (stage-agnostic);
- ``encode``    — the image→features (+concept top-k) EncodeBatcher;
- ``multihost`` — the lockstep control plane for meshes spanning
                  ``jax.distributed`` processes.

The public entry point remains ``insenticap_model_tpu.serving_daemon``
(DynamicBatcher + re-exports of everything below); these modules keep
each machine independently readable and under 500 lines.
"""
from .batching import (AUTO, DEFAULT_BUCKETS,  # noqa: F401
                       DEFAULT_ENCODE_BUCKETS, Saturated, default_buckets,
                       default_encode_buckets, prometheus_metrics)
from .encode import EncodeBatcher  # noqa: F401
