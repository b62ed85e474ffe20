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


def test_native_scale_decode_parity(lib):
    import ml_dtypes
    rng = np.random.default_rng(1)
    # E4M3 (positive, non-NaN): every byte value 0..126 appears
    s = np.arange(127, dtype=np.uint8).repeat(4).reshape(127 * 2, 2)
    nat = runtime.process_scales_native(s, s.shape[0], s.shape[1], group=16)
    ref = formats.e4m3_decode(s).T.astype(ml_dtypes.bfloat16)
    assert np.array_equal(nat.view(np.uint16), ref.view(np.uint16))
    # E8M0: every byte value 0..254 (byte 0 -> exact 0.0 by contract);
    # rows duplicated per 16-element half-group (stride-16 contract)
    s2 = np.arange(255, dtype=np.uint8).repeat(2).reshape(255, 2)
    nat2 = runtime.process_scales_native(s2, 255, 2, group=32)
    ref2 = np.repeat(np.where(s2 == 0, np.float32(0),
                              formats.e8m0_decode(s2)).T
                     .astype(ml_dtypes.bfloat16), 2, axis=0)
    assert np.array_equal(nat2.view(np.uint16), ref2.view(np.uint16))


def test_native_repack_rejects_bad_shape(lib):
    with pytest.raises(ValueError):
        runtime.repack_fp4_native(np.zeros((16, 50), np.uint8), 16, 100)


def test_native_repack_is_fast(lib):
    """Llama-70B single-projection scale: (8192, 8192) nibbles at load
    time. The bound is LOAD-RELATIVE: a fixed wall-clock bound flakes on
    shared 1-vCPU CI hosts (measured 0.9 s idle, 3.3-11.6 s when the full
    suite runs concurrently) — so yardstick against same-size numpy
    traffic, which inflates proportionally under the same contention.
    Catches algorithmic regressions (an O(n*k) scalar fallback is
    hundreds of x the yardstick), not scheduler noise."""
    n, k = 8192, 8192
    qw = np.zeros((n, k // 2), np.uint8)
    runtime.repack_fp4_native(qw, 512, 512)  # warm threads
    t0 = time.perf_counter()
    base = qw.copy() + 1   # one read+write pass over the same 32 MB
    t_copy = time.perf_counter() - t0
    del base
    t0 = time.perf_counter()
    runtime.repack_fp4_native(qw, n, k)
    dt = time.perf_counter() - t0
    bound = max(2.0, 40 * t_copy)
    assert dt < bound, (f"native repack too slow: {dt:.2f}s for 32 MB "
                        f"(yardstick copy {t_copy * 1e3:.0f} ms, "
                        f"bound {bound:.1f}s)")
