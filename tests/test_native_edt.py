import os
import shutil

import numpy as np
import pytest
from scipy import ndimage


def get_native():
    import ffn_tpu.native as native
    if native.edt_native is None and shutil.which("g++"):
        from ffn_tpu.native import build
        build.build(verbose=False)
        import importlib
        importlib.reload(native)
    return native.edt_native


@pytest.fixture(scope="module")
def edt_native():
    native = get_native()
    if native is None:
        pytest.skip("native library unavailable (no g++)")
    return native


def test_matches_scipy_exactly(edt_native):
    rng = np.random.RandomState(0)
    binary = rng.rand(40, 50, 60) > 0.3
    got = edt_native.edt(binary, (1, 1, 1))
    want = ndimage.distance_transform_edt(binary).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_anisotropy(edt_native):
    rng = np.random.RandomState(1)
    binary = rng.rand(30, 30, 30) > 0.5
    aniso = (3.0, 1.5, 1.0)
    got = edt_native.edt(binary, aniso)
    want = ndimage.distance_transform_edt(
        binary, sampling=aniso).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_all_foreground_is_inf(edt_native):
    assert np.isinf(edt_native.edt(np.ones((8, 8, 8), bool),
                                   (1, 1, 1))).all()


def test_all_background_is_zero(edt_native):
    assert (edt_native.edt(np.zeros((8, 8, 8), bool), (1, 1, 1)) == 0).all()


def test_2d(edt_native):
    rng = np.random.RandomState(2)
    binary = rng.rand(50, 50) > 0.4
    got = edt_native.edt(binary, (1, 1))
    want = ndimage.distance_transform_edt(binary).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_ops_edt_dispatches_to_native(edt_native):
    from ffn_tpu.ops import edt as edt_lib
    if edt_lib.edt_native is None:
        pytest.skip("ops.edt imported before the library was built")
    rng = np.random.RandomState(3)
    binary = rng.rand(20, 20, 20) > 0.4
    got = edt_lib.edt(binary, (2.0, 1.0, 1.0))
    want = ndimage.distance_transform_edt(
        binary, sampling=(2.0, 1.0, 1.0)).astype(np.float32)
    np.testing.assert_array_equal(got, want)
