"""Native C++ runtime repack: bit parity with the numpy spec + speed sanity."""

import time

import numpy as np
import pytest

from petit_kernel_tpu import runtime
from petit_kernel_tpu.ops import layout
from petit_kernel_tpu.numerics import formats


@pytest.fixture(scope="module")
def lib():
    lib = runtime.get_lib()
    if lib is None:
        pytest.skip("native runtime unavailable (no g++?)")
    return lib


def test_native_repack_parity(lib):
    rng = np.random.default_rng(0)
    for (n, k) in [(16, 128), (48, 512), (256, 1024), (80, 2048)]:
        qw = rng.integers(0, 256, size=(n, k // 2), dtype=np.uint8)
        ref = layout.repack_fp4_weights(qw, n, k, use_native=False)
        nat = layout.repack_fp4_weights(qw, n, k, use_native=True)
        assert np.array_equal(ref, nat), (n, k)


def test_native_scale_transpose_parity(lib):
    rng = np.random.default_rng(1)
    s = rng.integers(0, 127, size=(96, 64), dtype=np.uint8)
    nat = runtime.process_scales_native(s, 96, 64)
    assert np.array_equal(nat, s.T)


def test_native_repack_rejects_bad_shape(lib):
    with pytest.raises(ValueError):
        runtime.repack_fp4_native(np.zeros((16, 50), np.uint8), 16, 100)


def test_native_repack_is_fast(lib):
    """Llama-70B single-projection scale: (8192, 8192) nibbles in < 1s."""
    n, k = 8192, 8192
    qw = np.zeros((n, k // 2), np.uint8)
    runtime.repack_fp4_native(qw, 512, 512)  # warm threads
    t0 = time.perf_counter()
    runtime.repack_fp4_native(qw, n, k)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"native repack too slow: {dt:.2f}s for 32 MB"
