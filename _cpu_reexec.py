"""pytest early plugin (loaded via pytest.ini addopts = -p _cpu_reexec).

The host environment pins JAX to the TPU tunnel through a sitecustomize hook
that registers the backend at interpreter start. Tests need the virtual
8-device CPU backend instead, so before pytest starts capturing fds we
re-exec with a scrubbed environment (idempotent: the child no longer matches
the condition). Running at plugin-import time (before capture) keeps pytest's
terminal output intact.
"""
import os
import sys

_pp = os.environ.get("PYTHONPATH", "")
if ".axon_site" in _pp or os.environ.get("JAX_PLATFORMS", "cpu") != "cpu":
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in _pp.split(":") if p and ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
