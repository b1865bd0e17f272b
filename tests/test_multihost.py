"""REAL multi-process mesh test: two OS processes, `initialize_multihost`,
one global mesh, and an actual spp-allreduce render step whose psum crosses
the process boundary (Gloo collectives on the CPU backend).

The reference has no distributed story at all (SURVEY §2.3 P3); this proves
the framework's multi-host wrapper beyond the single-host no-op: each
process contributes its own sample batch and both see the identical merged
accumulator, which is bit-equal to a single-process render of the union of
both key sets.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

WORKER = r"""
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

sys.path.insert(0, {root!r})
sys.path.insert(0, {here!r})

# jax.distributed.initialize must precede ANY backend use; importing the
# full package creates jnp constants, so load the mesh module standalone
# (it imports only jax.sharding) and bring the distributed runtime up
# through the framework's own wrapper first.
import importlib.util
_spec = importlib.util.spec_from_file_location(
    'pts_mesh_standalone',
    {root!r} + '/pathtracing_spectrum_tpu/parallel/mesh.py')
_mesh_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mesh_mod)
_mesh_mod.initialize_multihost(coordinator_address='127.0.0.1:' + port,
                               num_processes=2, process_id=pid)
from pathtracing_spectrum_tpu.parallel.mesh import make_mesh

import numpy as np
import jax.numpy as jnp
from pathtracing_spectrum_tpu import camera_rays
from pathtracing_spectrum_tpu.parallel.tiling import SppAllreduce
from scene_helpers import cornell_scene

assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()          # global: one CPU device per process
assert len(devs) == 2, devs

sc = cornell_scene(depth=1, res=(8, 8))
scene = sc.compile()
ro, rd = camera_rays(sc.camera(), 8, 8)
sa = SppAllreduce(make_mesh(devs))
ro_r, rd_r = sa.shard_rays(ro, rd)
total = sa.zeros_accumulator(64, 4)
samples = jnp.zeros((), jnp.int32)
key = jax.random.key(0)
total, s, out, nrays = sa.render_sample(scene, ro_r, rd_r, total, samples,
                                        key, max_depth=1, backend='dense')
# each of the 2 devices contributed one sample; psum merged them
assert int(s) == 2, int(s)
res = np.asarray(jax.device_get(out))
assert np.isfinite(res).all() and res.mean() > 0
np.save(out_path + f'.{{pid}}.npy', res)
print('WORKER', pid, 'OK', res.mean())
"""


@pytest.mark.skipif(os.environ.get("PTS_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
@pytest.mark.slow
def test_two_process_spp_allreduce(tmp_path):
    port = "19755"
    out = str(tmp_path / "mh")
    code = WORKER.format(root=ROOT, here=HERE)
    env = dict(os.environ)
    # workers manage their own platform/device count
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i), port, out],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout)
        assert p.returncode == 0, stdout[-2000:]
    a = np.load(out + ".0.npy")
    b = np.load(out + ".1.npy")
    # both processes observe the identical merged accumulator
    np.testing.assert_array_equal(a, b)
    assert any("WORKER 0 OK" in l for l in logs)
    assert any("WORKER 1 OK" in l for l in logs)
