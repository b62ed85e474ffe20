"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU runs are exercised by bench.py / tools/, not pytest.

Note: this image's axon sitecustomize initializes the PJRT layer at
interpreter start, which makes XLA_FLAGS=--xla_force_host_platform_device_count
ineffective; jax.config.update('jax_num_cpu_devices', ...) before first
backend use still works, so use that.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS path above covers it
