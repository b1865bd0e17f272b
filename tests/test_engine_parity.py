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


def test_engine_common_blocks_match_inline_body():
    """engine_common's factored shading blocks (the per-phase profiler's
    measurement surface) must not drift from engine.py's inline bounce
    body: a mini lockstep tracer built from the blocks, fed the same
    variates, must reproduce trace_radiance to ulp level. (Not bitwise:
    trace_radiance's fori_loop body compiles as one fused program while
    this loop runs op-by-op, so XLA may reassociate — observed max
    1e-7 relative on 2/256 pixels.)"""
    from pathtracing_spectrum_tpu import engine_common as ec
    from pathtracing_spectrum_tpu.ops import sampling
    from pathtracing_spectrum_tpu.constants import EPS

    depth = 3
    sc = cornell_scene(sky=True,
                       block_types=(MaterialType.SPECULAR,
                                    MaterialType.GLASS))
    sc.trace_depth = depth
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 8, 8)
    n = ro.shape[0]
    nw = scene.wavenumbers.shape[0]
    rng = np.random.default_rng(17)
    rand = jnp.asarray(rng.uniform(0, 1, (2 * depth, 4, n))
                       .astype(np.float32))

    want = np.asarray(trace_radiance(
        scene, ro, rd, jax.random.key(0), depth, backend="dense",
        rand_override=rand).radiance)

    ctx = ec.make_ctx(scene, backend="dense")
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    thr = jnp.ones((nw, n), jnp.float32)
    rad = jnp.zeros((nw, n), jnp.float32)
    inside = jnp.zeros(n, bool)
    alive = jnp.ones(n, bool)
    for h in range(2 * depth):
        hit, t, idx, s2, s3 = ctx.intersect(rox, roy, roz, rdx, rdy, rdz)
        hit = hit & alive
        attrs_t = ec.fetch_attrs(ctx, idx)
        pox, poy, poz, nx, ny, nz, rough, uvu, uvv = ec.shade_geometry(
            ctx, attrs_t, rox, roy, roz, rdx, rdy, rdz, t, s2, s3)
        rr_rand, u_rand, th_rand, fr_rand = rand[h]
        killed = hit & (h >= depth - 1) & (rr_rand
                                           > ec.row(ctx, attrs_t, "rr_prob"))
        miss = alive & ~hit
        survive = hit & ~killed
        emis_t, emis_eff, refl_eff = ec.material_spectra(ctx, attrs_t,
                                                         uvu, uvv)
        contrib = (miss[None, :] * scene.sky[:, None]
                   + killed[None, :] * emis_t
                   + survive[None, :] * emis_eff)
        rad = rad + thr * contrib
        thr = jnp.where(survive[None, :], thr * refl_eff, thr)
        b = sampling.sample_bounce_soa(
            ec.row(ctx, attrs_t, "mat_type").astype(jnp.int32),
            rdx, rdy, rdz, nx, ny, nz, rough, inside,
            u_rand, th_rand, fr_rand)
        back = jnp.where(b.refracted, EPS * 2.0, 0.0)
        park = jnp.float32(1e30)
        rox = jnp.where(survive, pox - nx * back, park)
        roy = jnp.where(survive, poy - ny * back, park)
        roz = jnp.where(survive, poz - nz * back, park)
        rdx = jnp.where(survive, b.dx, 0.0)
        rdy = jnp.where(survive, b.dy, 0.0)
        rdz = jnp.where(survive, b.dz, 0.0)
        inside = jnp.where(survive, b.new_inside, inside)
        alive = survive
    rad = rad + alive[None, :] * thr * scene.sky[:, None]
    got = np.asarray(rad.T)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
