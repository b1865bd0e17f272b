"""Spectral txt import/export (main.cpp:217-338, 951-1023 semantics)."""

import numpy as np

from pathtracing_spectrum_tpu.utils import spectral_io


def test_load_waves_stops_at_non_numeric(tmp_path):
    p = tmp_path / "waves.txt"
    p.write_text("500 1000.5\n1500\nbanana 2000\n")
    assert spectral_io.load_spectrum_waves(str(p)) == [500.0, 1000.5, 1500.0]


def test_load_materials_alternating_lines(tmp_path):
    p = tmp_path / "mats.txt"
    p.write_text("steel\n0.1 0.2 0.3\npaint flat white\n0.9 0.95\n")
    mats = spectral_io.load_spectrum_materials(str(p), n_waves=3)
    assert [m.name for m in mats] == ["steel", "paint flat white"]
    assert mats[0].emissivity == [0.1, 0.2, 0.3]
    assert mats[1].emissivity == [0.9, 0.95, 0.0]  # missing -> 0


def test_export_format_and_round_trip(tmp_path):
    img = np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2)
    img[1, 2, 0] = np.nan  # NaN -> 0 (main.cpp:970-972)
    p = str(tmp_path / "out.txt")
    spectral_io.export_spectrum(p, img)
    text = open(p).read()
    lines = text.splitlines()
    assert len(lines) == 4  # nw=2 wavelengths x H=2 rows
    # first line = top row of wavelength 0
    assert lines[0].split() == ["0", "2", "4"]
    assert lines[1].split() == ["6", "8", "0"]  # NaN zeroed
    back = spectral_io.import_spectrum(p, width=3, height=2, n_waves=2)
    img0 = np.where(np.isnan(img), 0.0, img)
    np.testing.assert_allclose(back, img0, rtol=1e-6)


def test_default_export_name():
    import time
    t = time.struct_time((2024, 3, 7, 9, 5, 2, 0, 0, 0))
    name = spectral_io.default_export_name("/a/b/myscene.pts", t)
    # reference keeps 0-based month and no zero padding (main.cpp:995-1002)
    assert name == "myscene_202427_9_5_2.txt"
    assert spectral_io.default_export_name("", t).startswith("Untitled_")


def test_native_export_byte_identical(tmp_path):
    """The C++ exporter (std::to_chars general/6 == printf %g == the
    Python formatter) must produce byte-identical files, NaN->0 and all
    exponent/edge cases included."""
    import numpy as np
    import pytest
    from pathtracing_spectrum_tpu.native import (available,
                                                 export_spectrum_native)
    from pathtracing_spectrum_tpu.utils.spectral_io import format_spectrum

    if not available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    img = rng.normal(0, 1e3, (19, 23, 3)).astype(np.float32)
    img[0, 0, 0] = np.nan
    img[1, 2, 1] = 0.0
    img[2, 3, 2] = -0.0
    img[3, 4, 0] = 1e-38
    img[5, 6, 1] = 3.0e38
    img[9, 9, 0] = 123456.7
    img[10, 10, 1] = 1234567.8
    img[11, 11, 2] = 0.000012345
    p = str(tmp_path / "n.txt")
    assert export_spectrum_native(p, img)
    assert open(p).read() == format_spectrum(img)
