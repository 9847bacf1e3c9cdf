"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (the standard JAX pattern,
SURVEY.md §4). Must run before jax is imported anywhere."""
import os

# TPU-env scrubbing happens in the _cpu_reexec plugin (see pytest.ini),
# which re-execs pytest onto the CPU backend before fd capture starts.
# The flags below are a fallback for direct `pytest tests/...` runs in an
# already-clean environment.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native components (isclm, libfstore) if absent so the suite is
# green from a clean checkout — binaries are intentionally not committed.
_NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")
if os.path.isdir(_NATIVE) and not os.path.exists(
        os.path.join(_NATIVE, "build", "isclm")):
    subprocess.run(["make", "-C", _NATIVE], check=False,
                   capture_output=True)


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def settings():
    """Tiny architecture for fast tests."""
    from insenticap_model_tpu.config import Settings
    return Settings(word_emb_dim=16, fc_feat_dim=32, att_feat_dim=32,
                    feat_emb_dim=16, dropout_p=0.5, rnn_hid_dim=16,
                    att_hid_dim=16, concept_mid_dim=24)


@pytest.fixture(scope="session")
def vocab():
    from insenticap_model_tpu.vocab import Vocab
    words = ["<PAD>", "<UNK>", "<SOS>", "<EOS>"] + [f"w{i}" for i in range(20)]
    return Vocab(words)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)
