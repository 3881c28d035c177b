"""Test-wide config: force an 8-device CPU platform for mesh tests.

The axon sitecustomize pins jax_platforms to the TPU tunnel; tests override
to CPU (hardware-free, deterministic) with 8 virtual devices so SP/TP/DP
meshes are exercised, mirroring the reference's gloo-on-CPU test strategy
(/root/reference/fastvideo/tests/conftest.py:11-23).
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      os.environ.get("XLA_FLAGS", "") +
                      " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
