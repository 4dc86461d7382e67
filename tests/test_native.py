"""
Native C++ spatial helper: builds (when toolchain present) and agrees with
the numpy fallback exactly.
"""

import os
import subprocess

import numpy as np
import pytest


def test_native_matches_numpy_fallback():
    here = os.path.join(os.path.dirname(__file__), "..",
                        "gpim_tpu", "native")
    so = os.path.join(here, "_spatial.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["sh", os.path.join(here, "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            pytest.skip("no C++ toolchain")
    # force (re)load
    from gpim_tpu.native import spatial
    spatial._TRIED = False
    spatial._LIB = None
    assert spatial.native_available()

    rng = np.random.RandomState(0)
    for trial, dscale in enumerate([0.5, 2.0, 5.0, 10.0, 0.0]):
        pts = rng.rand(500, 2) * 30
        spatial._TRIED = False
        spatial._LIB = None
        native = spatial.spaced_batch(pts, dscale, max_out=25)
        assert spatial.native_available()
        spatial._LIB = None
        spatial._TRIED = True  # simulate missing .so -> numpy fallback
        fallback = spatial.spaced_batch(pts, dscale, max_out=25)
        assert native == fallback, (dscale, native[:5], fallback[:5])
    spatial._TRIED = False
    spatial._LIB = None
