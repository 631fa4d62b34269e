"""Multi-device sharding: the full training step over an 8-device CPU mesh."""
import numpy as np
import jax
import pytest


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8, 64, 64, 3)


def test_sharded_batch_matches_single_device():
    """Inference math must be identical regardless of sharding."""
    import jax.numpy as jnp
    from lc_tpu.parallel.mesh import make_mesh, shard_batch
    from lc_tpu.pnp.solver import lm_refine
    from lc_tpu import geom
    from scipy.spatial.transform import Rotation as sciR

    rng = np.random.default_rng(0)
    B = 8
    K = np.broadcast_to(np.array([[500.0, 0, 128], [0, 500, 128], [0, 0, 1]],
                                 np.float32), (B, 3, 3))
    Rs = sciR.random(B, random_state=0).as_matrix().astype(np.float32)
    ts = np.concatenate((rng.uniform(-20, 20, (B, 2)),
                         rng.uniform(500, 700, (B, 1))), -1).astype(np.float32)
    pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
    pts3d = rng.uniform(-30, 30, (B, 32, 3)).astype(np.float32)
    uv = np.asarray(geom.project_apply(jnp.asarray(K), jnp.asarray(pts3d),
                                       jnp.asarray(Rs), jnp.asarray(ts)))
    start = pose.copy()
    start[:, 4] += 5.0
    w = np.ones((B, 32, 2), np.float32)

    single = lm_refine(jnp.asarray(start), jnp.asarray(K), jnp.asarray(pts3d),
                       jnp.asarray(uv), jnp.asarray(w))
    mesh = make_mesh(8)
    with mesh:
        args = shard_batch(mesh, tuple(
            jnp.asarray(a) for a in (start, K, pts3d, uv, w)))
        sharded = jax.jit(lm_refine)(*args)
    np.testing.assert_allclose(np.asarray(sharded.pose7),
                               np.asarray(single.pose7), atol=1e-4)
