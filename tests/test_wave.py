"""Wave host type: size-mismatch-tolerant arithmetic (wave.cpp:29-111)."""

import numpy as np

from pathtracing_spectrum_tpu import Wave


def test_binary_ops_min_size_with_excess_copy():
    a = Wave([1.0, 2.0, 3.0])
    b = Wave([10.0, 20.0])
    s = a + b
    assert s.size() == 3
    assert np.allclose(s.data, [11.0, 22.0, 3.0])  # excess copied unchanged
    m = a * b
    assert np.allclose(m.data, [10.0, 40.0, 3.0])
    d = a - b
    assert np.allclose(d.data, [-9.0, -18.0, 3.0])


def test_scalar_ops():
    a = Wave([1.0, 2.0])
    assert np.allclose((a * 2.0).data, [2.0, 4.0])
    assert np.allclose((a / 2.0).data, [0.5, 1.0])


def test_inplace_ops_touch_overlap_only():
    a = Wave([1.0, 2.0, 3.0])
    a += Wave([1.0, 1.0])
    assert np.allclose(a.data, [2.0, 3.0, 3.0])
    a -= Wave([1.0, 1.0, 1.0, 5.0])
    assert np.allclose(a.data, [1.0, 2.0, 2.0])


def test_initialize_resets_to_zero():
    a = Wave([1.0, 2.0])
    a.initialize(4)
    assert a.size() == 4
    assert np.allclose(a.data, 0.0)
