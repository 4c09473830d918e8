"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native 'fake multi-chip' idiom — multi-device sharding
(including the implicit cross-replica BatchNorm psums) compiles and executes
on host CPU exactly as it would over ICI.
"""

import os

# Must be set before the jax backend initializes.  Tests always run on host
# CPU (numerics are f32-exact and the 8-device virtual mesh is available).
# The session environment may pin JAX_PLATFORMS to a TPU plugin that ignores
# the env override, so also force it through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
