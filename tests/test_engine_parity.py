"""Wavefront engine vs the recursive numpy oracle, with shared randoms.

The engine's `rand_override` lets both implementations consume identical
variates, so results must agree to float tolerance — this validates the
whole bounce loop: RR timing and kill spectrum, depth-cap sky fall-through,
material sampling, glass inside-tracking, temperature re-bake.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_spectrum_tpu import MaterialType, camera_rays
from pathtracing_spectrum_tpu.engine import trace_radiance

import oracle
from scene_helpers import cornell_scene


def run_parity(scene_builder, depth, n_pix=8, seed=3, backend="dense"):
    sc = scene_builder()
    sc.trace_depth = depth
    scene = sc.compile(build_bvh=(backend == "bvh"))
    cam = sc.camera()
    ro, rd = camera_rays(cam, n_pix, n_pix)
    ro_np = np.asarray(ro, np.float64)
    rd_np = np.asarray(rd, np.float64)
    n = ro.shape[0]

    rng = np.random.default_rng(seed)
    rand = rng.uniform(0, 1, (2 * depth, 4, n)).astype(np.float32)

    res = trace_radiance(scene, ro, rd, jax.random.key(0), depth,
                         backend=backend, rand_override=jnp.asarray(rand))
    got = np.asarray(res.radiance)

    osc = oracle.OracleScene(scene)
    want = np.stack([
        oracle.trace(osc, ro_np[k], rd_np[k], depth, rand, k)
        for k in range(n)
    ])
    return got, want


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_cornell_diffuse_parity(depth):
    got, want = run_parity(lambda: cornell_scene(sky=True), depth)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_cornell_specular_glass_parity():
    got, want = run_parity(
        lambda: cornell_scene(sky=True,
                              block_types=(MaterialType.SPECULAR,
                                           MaterialType.GLASS)),
        depth=4, n_pix=8, seed=11)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_cornell_glossy_parity():
    got, want = run_parity(
        lambda: cornell_scene(sky=False,
                              block_types=(MaterialType.GLOSSY,
                                           MaterialType.GLOSSY)),
        depth=3, n_pix=8, seed=5)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_cornell_glossy_axis_wall_parity():
    """Glossy side walls (n = +-x): the tangent-frame branch condition tests
    n.x while framing around r (pathtracer.cpp:484) — the (1,1,1)-cross
    branch must be taken on these walls in both engine and oracle."""
    from pathtracing_spectrum_tpu import Material

    def builder():
        sc = cornell_scene(sky=True)
        for i, el in enumerate(sc.objects[0].elements):
            if el.name in ("left", "right"):
                sc.set_material(0, i, Material(
                    type=MaterialType.GLOSSY, roughness=0.5,
                    temperature=25.0, spectrum_mat_id=1))
        return sc

    got, want = run_parity(builder, depth=3, n_pix=8, seed=7)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_bvh_backend_parity():
    got, want = run_parity(lambda: cornell_scene(sky=True), depth=2,
                           backend="bvh", seed=9)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_temperature_grid_parity(tmp_path):
    """Per-hit temperature re-bake (incl. the RR-kill baked-emissivity quirk)
    against the oracle with shared variates."""
    # 3-wide grid: texel boundaries at 1/3 and 2/3 never coincide with the
    # pixel-corner uv lattice (k/8), so fp-order can't flip a texel choice
    grid = tmp_path / "grid.txt"
    grid.write_text("100 300 -50\n-50 700 250\n20 400 90\n")

    def builder():
        sc = cornell_scene(sky=True)
        sc.set_temperature_data(0, 2, str(grid))  # back wall (has UVs)
        sc.set_temperature_data(0, 0, str(grid))  # floor
        return sc

    got, want = run_parity(builder, depth=3, n_pix=8, seed=21)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
