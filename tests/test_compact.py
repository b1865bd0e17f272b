"""Compaction (shrinking-prefix) engine: bit-identity with an empty
schedule, statistical equivalence with splits, poison safety, schedule
learning, and session/checkpoint integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_spectrum_tpu.engine import render_samples
from pathtracing_spectrum_tpu.engine_compact import (compact_render_samples,
                                                     learn_schedule)
from pathtracing_spectrum_tpu.models.camera import camera_rays
from pathtracing_spectrum_tpu.render import RenderSession

from scene_helpers import cornell_scene


def _trace_inputs(res=32, depth=3):
    sc = cornell_scene(depth=depth, res=(res, res))
    sd = sc.compile()
    ro, rd = camera_rays(sc.camera(), res, res)
    n = res * res
    t0 = jnp.zeros((n, 4), jnp.float32)
    s0 = jnp.zeros((), jnp.int32)
    return sc, sd, ro, rd, t0, s0


def test_uniform4_at_pins_jax_random_uniform():
    """_uniform4_at(key, src, n) must equal uniform(key, (4, n))[:, src]
    bit-for-bit — the engine's whole RNG bit-identity claim rests on
    jax's partitionable-threefry counter layout staying put."""
    from pathtracing_spectrum_tpu.engine_compact import _uniform4_at
    key = jax.random.fold_in(jax.random.key(7), 3)
    n = 640
    ref = np.asarray(jax.random.uniform(key, (4, n)))
    src = jnp.asarray(np.random.default_rng(0).permutation(n)[:200],
                      jnp.float32)
    got = _uniform4_at(key, src, n)
    for c in range(4):
        np.testing.assert_array_equal(np.asarray(got[c]),
                                      ref[c, np.asarray(src, np.int32)])


def test_interleave_blocks_round_robin():
    """interleave_blocks: valid permutation, 1024-ray blocks stay
    contiguous, and consecutive blocks land in distinct segments."""
    from pathtracing_spectrum_tpu.engine_compact import (interleave_blocks,
                                                         _segment_for)
    n = 1 << 18                      # 262144 -> 4 segments of 65536
    seg = _segment_for(n)
    ns = n // seg
    assert ns == 4
    p = interleave_blocks(n)
    assert np.array_equal(np.sort(p), np.arange(n))
    blocks = p.reshape(-1, 1024)
    assert (np.diff(blocks, axis=1) == 1).all()      # blocks contiguous
    # engine segment s receives blocks s, ns+s, 2ns+s, ... of the input:
    # input block b sits at engine rows [rank]...; check round-robin by
    # mapping each engine-side block to its input block id
    ids = blocks[:, 0] // 1024
    assert (ids.reshape(ns, -1) % ns
            == np.arange(ns)[:, None]).all()
    # small/odd sizes decline
    assert interleave_blocks(65536) is None
    assert interleave_blocks(1000) is None


@pytest.mark.slow
def test_empty_schedule_bit_identical_to_lockstep():
    sc, sd, ro, rd, t0, s0 = _trace_inputs(16)
    key = jax.random.key(0)
    _, sa, outa, ra = render_samples(sd, ro, rd, t0, s0, key, 0, n_steps=3,
                                     max_depth=3, backend="dense")
    t0b = jnp.zeros_like(t0)
    _, sb, outb, rb, prof, valid = compact_render_samples(
        sd, ro, rd, t0b, s0, key, 0, n_steps=3, max_depth=3,
        backend="dense")
    np.testing.assert_array_equal(np.asarray(outa), np.asarray(outb))
    assert int(ra) == int(rb)
    assert np.asarray(valid).all()
    # alive profile: monotone non-increasing live counts
    p = np.asarray(prof)
    assert p[0] == 256 and (np.diff(p) <= 0).all()


@pytest.mark.slow
def test_split_schedule_matches_lockstep_statistically():
    sc, sd, ro, rd, t0, s0 = _trace_inputs(64, depth=4)
    key = jax.random.key(1)
    n = 64 * 64
    # learn from one sample, then render with real splits
    _, _, _, _, prof, _ = compact_render_samples(
        sd, ro, rd, jnp.zeros_like(t0), s0, key, 0, n_steps=1,
        max_depth=4, backend="dense")
    sched = learn_schedule(prof, n, 4)
    assert sched, f"expected splits for profile {np.asarray(prof)}"
    _, scn, outc, rc, _, valid = compact_render_samples(
        sd, ro, rd, jnp.zeros_like(t0), s0, key, 0, n_steps=16,
        max_depth=4, backend="dense", schedule=sched)
    assert np.asarray(valid).all() and int(scn) == 16
    _, _, outl, rl = render_samples(sd, ro, rd, jnp.zeros_like(t0), s0,
                                    key, 0, n_steps=16, max_depth=4,
                                    backend="dense")
    a, b = np.asarray(outc), np.asarray(outl)
    assert not np.isnan(a).any() and (a >= 0).all()
    rel = abs(a.mean() - b.mean()) / b.mean()
    assert rel < 0.1, rel


def test_poison_invalidates_instead_of_corrupting():
    sc, sd, ro, rd, t0, s0 = _trace_inputs(64)
    key = jax.random.key(2)
    total, scn, out, rays, prof, valid = compact_render_samples(
        sd, ro, rd, jnp.zeros_like(t0), s0, key, 0, n_steps=2,
        max_depth=3, backend="dense", schedule=((1, 1024),))
    # a closed box keeps ~all 4096 rays alive at iteration 1 -> overflow
    assert not np.asarray(valid).any()
    assert int(scn) == 0
    assert float(np.abs(np.asarray(total)).sum()) == 0.0


def test_learn_schedule_quantization():
    prof = np.array([4096, 4000, 1800, 900, 300, 100])
    sched = learn_schedule(prof, 4096, 3)
    assert sched == ((2, 3072), (3, 2048), (4, 1024))
    # margin never exceeds N; tiny scenes never split
    assert learn_schedule(np.array([64] * 6), 64, 3) == ()


@pytest.mark.slow
def test_session_compact_deterministic_and_matches_standard():
    def mk(compact):
        sc = cornell_scene(depth=4, res=(64, 64))
        return RenderSession(sc, backend="dense", compact=compact, seed=9)

    a = mk(True).run(target_spp=8)
    b = mk(True).run(target_spp=8)
    np.testing.assert_array_equal(a, b)          # deterministic given seed
    c = mk(False).run(target_spp=8)
    rel = abs(a.mean() - c.mean()) / c.mean()
    assert rel < 0.15, rel


@pytest.mark.slow
def test_session_compact_checkpoint_exact_resume(tmp_path):
    p = str(tmp_path / "c.npz")
    sc = cornell_scene(depth=4, res=(64, 64))
    s = RenderSession(sc, backend="dense", compact=True, seed=4)
    s.run(target_spp=3)
    s.save_checkpoint(p)
    s.run(target_spp=6)
    full = s.result()

    sc2 = cornell_scene(depth=4, res=(64, 64))
    r = RenderSession(sc2, backend="dense", compact=True, seed=4)
    r.start()
    r.load_checkpoint(p)
    r.run(target_spp=6)
    np.testing.assert_array_equal(r.result(), full)

    # cross-mode resume refused (the sample schedule differs)
    t = RenderSession(cornell_scene(depth=4, res=(64, 64)),
                      backend="dense", compact=False, seed=4)
    t.start()
    with pytest.raises(ValueError, match="compact"):
        t.load_checkpoint(p)


def test_compact_rejects_unsupported_modes():
    sc = cornell_scene(depth=2, res=(8, 8))
    with pytest.raises(ValueError, match="compact"):
        RenderSession(sc, compact=True, jitter=True)
    # "auto" silently defers to the standard engine instead
    s = RenderSession(sc, compact="auto", jitter=True)
    assert not s.use_compact()
