"""Render session state machine, target-spp auto-pause, checkpoint/resume."""

import numpy as np
import pytest

from pathtracing_spectrum_tpu.render import RenderSession, RenderStatus

from scene_helpers import cornell_scene


def small_session(**kw):
    sc = cornell_scene(depth=2, res=(8, 8))
    return RenderSession(sc, backend="dense", **kw)


def test_progressive_mean_semantics():
    s = small_session()
    s.start()
    img1 = s.step(1)
    total1 = img1 * 1
    img4 = s.step(3)
    assert s.samples == 4
    # out = total / samples (pathtracer.cpp:595-598): means stay bounded
    assert np.isfinite(img4).all()
    assert img4.shape == (8, 8, 4)


def test_pause_keeps_stop_discards():
    s = small_session()
    s.start()
    s.step(2)
    s.pause()
    assert s.status == RenderStatus.PAUSED
    assert s.samples == 2
    s.resume()
    s.step(1)
    assert s.samples == 3
    s.stop()
    s.start()  # restart from stopped -> accumulator reset
    assert s.samples == 0


def test_restart_resets():
    s = small_session()
    s.start()
    s.step(2)
    s.restart()
    assert s.samples == 0
    s.step(1)
    assert s.samples == 1


def test_target_spp_auto_pause():
    s = small_session()
    s.run(target_spp=3)
    assert s.samples == 3
    assert s.status == RenderStatus.PAUSED


def test_deterministic_given_seed():
    a = small_session(seed=7).run(target_spp=2)
    b = small_session(seed=7).run(target_spp=2)
    np.testing.assert_array_equal(a, b)
    c = small_session(seed=8).run(target_spp=2)
    assert not np.array_equal(a, c)


def test_checkpoint_exact_resume(tmp_path):
    p = str(tmp_path / "ckpt.npz")
    a = small_session(seed=3)
    a.run(target_spp=2)
    a.save_checkpoint(p)
    a.run(target_spp=5)
    full = a.result()

    b = small_session(seed=3)
    b.start()
    b.load_checkpoint(p)
    assert b.samples == 2
    b.run(target_spp=5)
    np.testing.assert_array_equal(b.result(), full)


def test_checkpoint_mismatch_rejected(tmp_path):
    p = str(tmp_path / "ckpt.npz")
    a = small_session()
    a.run(target_spp=1)
    a.save_checkpoint(p)
    sc = cornell_scene(depth=2, res=(16, 16))
    b = RenderSession(sc, backend="dense")
    b.start()
    with pytest.raises(ValueError):
        b.load_checkpoint(p)


def test_stats():
    s = small_session()
    s.run(target_spp=2)
    st = s.stats()
    assert st["samples"] == 2
    assert st["elapsed_s"] > 0
    assert st["rays_traced"] > 0
    assert st["mrays_per_s"] > 0
    assert st["triangles"] == 36
