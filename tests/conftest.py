"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use the standard
JAX pattern of faking devices on the host platform.  The environment may
preset a TPU backend (the axon tunnel's sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so
env vars alone cannot override it) — we force the config back to CPU before
any backend initializes.  Set ``QUBLAS_TEST_BACKEND`` to run the suite
against a real backend instead (e.g. ``QUBLAS_TEST_BACKEND=axon``).
"""

import os

backend = os.environ.get("QUBLAS_TEST_BACKEND", "cpu")
os.environ["JAX_PLATFORMS"] = backend
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", backend)
