"""Test env: force CPU with 8 virtual devices so pjit/mesh tests run without
TPU hardware (the TPU-native analog of fake-cluster testing, SURVEY.md §4).

A pytest plugin imports jax before this conftest runs, so setting
JAX_PLATFORMS via os.environ alone is too late — but XLA backends are not
initialized until first use, so `jax.config.update` still takes effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell may carry JAX_PLATFORMS=axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running training probe")
