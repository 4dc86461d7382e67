"""Environment invariants the rest of the suite relies on - pinned so a
broken assumption fails HERE with a readable message instead of as a
mystery numerics/shape failure three files later."""

import numpy as np


def test_cpu_backend_with_virtual_mesh():
    import jax
    assert jax.default_backend() == "cpu"
    assert jax.device_count() >= 8


def test_x64_and_matmul_precision_config():
    """The package import must have enabled f64 (reference defaults to
    double, gpr.py:92-99) and pinned matmul precision to highest (bf16
    operands sink GP numerics - CLAUDE.md hard-won facts)."""
    import jax
    import jax.numpy as jnp
    import gpim_tpu  # noqa: F401  (config side effects under test)
    assert jnp.asarray(1.0, jnp.float64).dtype == jnp.float64
    assert jax.config.jax_default_matmul_precision == "highest"


def test_public_api_surface():
    """The five reference names (gpim/__init__.py:1-5 parity)."""
    import gpim_tpu
    for name in ("utils", "reconstructor", "skreconstructor",
                 "vreconstructor", "boptimizer"):
        assert hasattr(gpim_tpu, name), name
    assert gpim_tpu.__all__ == ["utils", "reconstructor",
                                "skreconstructor", "vreconstructor",
                                "boptimizer"]


def test_native_spatial_available_with_fallback():
    """The C++ spacing library loads (or its numpy fallback engages) and
    matches a brute-force greedy spacing."""
    from gpim_tpu.native import spatial
    rng = np.random.RandomState(0)
    pts = rng.rand(200, 2) * 10
    got = spatial.spaced_batch(pts, 1.5, max_out=20)
    # brute-force greedy reference
    want, r2 = [], 1.5 ** 2
    for i in range(len(pts)):
        if all(((pts[i] - pts[j]) ** 2).sum() > r2 for j in want):
            want.append(i)
        if len(want) == 20:
            break
    assert got == want
    center = pts[17]
    ball = spatial.suppress_within(pts, center, 1.5)
    brute = np.flatnonzero(
        ((pts - center) ** 2).sum(1) <= 1.5 ** 2).tolist()
    assert ball == brute


def test_dtypes_defaults():
    """CPU backend -> double default precision; jitter matches dtype."""
    from gpim_tpu import dtypes
    assert dtypes.resolve_dtype(None) == np.float64
    assert dtypes.resolve_dtype("single") == np.float32
    assert dtypes.default_jitter(np.float32) >= dtypes.default_jitter(
        np.float64)
