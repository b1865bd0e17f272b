"""Fail-soft robustness: truncated/malformed inputs must error cleanly."""

import numpy as np
import pytest

from pathtracing_spectrum_tpu.utils import scene_io, spectral_io

from scene_helpers import cornell_scene


def test_truncated_scene_files_raise_cleanly(tmp_path):
    sc = cornell_scene()
    full = tmp_path / "full.pts"
    scene_io.save_scene(sc, str(full))
    text = full.read_text()
    # every truncation point must raise SceneFileError, never crash or hang
    for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        cut = tmp_path / "cut.pts"
        cut.write_text(text[:int(len(text) * frac)])
        with pytest.raises((scene_io.SceneFileError, OSError, ValueError)):
            scene_io.load_scene(str(cut))


def test_scene_with_garbage_numbers(tmp_path):
    p = tmp_path / "bad.pts"
    p.write_text("Path Tracer Scene File\nVersion=Spectrum 1.2.0\n"
                 "banana\n")
    with pytest.raises(scene_io.SceneFileError):
        scene_io.load_scene(str(p))


def test_obj_fuzz_native_matches_python(tmp_path):
    """Random junk interleaved with valid statements: both parsers must
    agree and not crash."""
    from pathtracing_spectrum_tpu import native
    from pathtracing_spectrum_tpu.utils.obj_loader import _load_obj_py

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    lines = []
    for i in range(300):
        r = rng.random()
        if r < 0.3:
            lines.append(f"v {rng.normal():.4f} {rng.normal():.4f} "
                         f"{rng.normal():.4f}")
        elif r < 0.4:
            lines.append(f"vt {rng.random():.4f} {rng.random():.4f}")
        elif r < 0.5:
            lines.append(f"vn 0 0 1")
        elif r < 0.7 and i > 10:
            nv = max(1, len([l for l in lines if l.startswith('v ')]))
            ids = rng.integers(1, nv + 1, 3)
            lines.append(f"f {ids[0]} {ids[1]} {ids[2]}")
        elif r < 0.8:
            lines.append(rng.choice(["s 1", "s off", "g grp" + str(i),
                                     "o obj" + str(i)]))
        else:
            lines.append(rng.choice(["# comment", "", "mtllib foo.mtl",
                                     "usemtl bar", "junk line 1 2",
                                     "f not numbers here"]))
    p = tmp_path / "fuzz.obj"
    p.write_text("\n".join(lines) + "\n")

    a = native.load_obj_native(str(p))
    b = _load_obj_py(str(p))
    np.testing.assert_allclose(a.vertices, b.vertices, rtol=1e-6)
    assert len(a.shapes) == len(b.shapes)
    for sa, sb in zip(a.shapes, b.shapes):
        np.testing.assert_array_equal(sa.v_idx, sb.v_idx)
        np.testing.assert_array_equal(sa.smoothing, sb.smoothing)


def test_spectral_import_empty_and_garbage(tmp_path):
    p = tmp_path / "w.txt"
    p.write_text("")
    assert spectral_io.load_spectrum_waves(str(p)) == []
    p.write_text("garbage\n")
    assert spectral_io.load_spectrum_waves(str(p)) == []
    p.write_text("1 2 nan 3\n")
    waves = spectral_io.load_spectrum_waves(str(p))
    assert waves[:2] == [1.0, 2.0]  # nan parses as float; stop not required


def test_render_zero_target_is_unbounded_guard():
    """target 0 = unbounded in the reference; run() must not loop forever
    when we cap it externally."""
    from pathtracing_spectrum_tpu.render import RenderSession
    s = RenderSession(cornell_scene(depth=1, res=(4, 4)), backend="dense")
    s.start()
    s.step(1)
    assert s.samples == 1  # step works without a target
