"""Async render loop (the reference's tracer-thread analog) and misc."""

import time

import numpy as np
import pytest

from pathtracing_spectrum_tpu.render import RenderSession, RenderStatus

from scene_helpers import cornell_scene


@pytest.mark.slow
def test_start_async_reaches_target_and_pauses():
    s = RenderSession(cornell_scene(depth=1, res=(8, 8)), backend="dense")
    s.start_async(target_spp=3)
    s.join(timeout=120)
    deadline = time.time() + 120
    while s.samples < 3 and time.time() < deadline:
        time.sleep(0.05)
    assert s.samples >= 3
    # auto-pause at target (main.cpp:4057-4061)
    deadline = time.time() + 30
    while s.status != RenderStatus.PAUSED and time.time() < deadline:
        time.sleep(0.05)
    assert s.status == RenderStatus.PAUSED
    img = s.result()
    assert np.isfinite(img).all() and img.mean() > 0
    s.stop()


def test_stop_terminates_async_loop():
    s = RenderSession(cornell_scene(depth=1, res=(8, 8)), backend="dense")
    s.start_async(target_spp=0)  # unbounded
    time.sleep(0.5)
    s.stop()
    s.join(timeout=60)
    assert not s._thread.is_alive()


def test_multihost_init_single_host_noop():
    from pathtracing_spectrum_tpu.parallel.mesh import initialize_multihost
    initialize_multihost()               # no args: no-op
    initialize_multihost(num_processes=1)  # single host: no-op
