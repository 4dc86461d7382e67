"""Environment invariants the rest of the suite relies on."""


def test_cpu_backend_with_virtual_mesh():
    import jax
    assert jax.default_backend() == "cpu"
    assert jax.device_count() >= 8
