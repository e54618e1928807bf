"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax and registers the `axon` TPU
plugin with JAX_PLATFORMS=axon,cpu — plain env vars set here are too late.
Instead we update the already-imported jax config (backends initialize
lazily, so this is still before any backend exists) and inject the
host-platform device-count flag before first device use.
SURVEY.md §4 item 4: DP-invariance tests run on this virtual 8-CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (sitecustomize already imported it anyway)

jax.config.update("jax_platforms", "cpu")


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} x {jax.devices()[0].platform}"
