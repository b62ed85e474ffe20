"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU runs are exercised by bench.py / tools/, not pytest.

Note: this image's axon sitecustomize calls
jax.config.update('jax_platforms', 'axon,cpu') at interpreter start, and
config-level settings take precedence over the JAX_PLATFORMS env var — so
the override here must also go through jax.config, before any backend is
instantiated.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it
