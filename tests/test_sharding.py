"""Multi-device sharding tests on the 8-device virtual CPU mesh:
multi-stream data-parallel serving, tensor-parallel params, and the
dp+tp+sp training step (the dryrun_multichip path)."""

import numpy as np
import pytest

import jax

from backscrub_tpu.graph.executor import load_model
from backscrub_tpu.models.specs import spec_for_model
from backscrub_tpu.parallel.mesh import (MultiStreamRunner, make_mesh,
                                         param_sharding_spec, shard_params)

from conftest import model_path

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_make_mesh_shape():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


@needs_8
def test_param_sharding_rules():
    mesh = make_mesh(8)
    m = load_model(model_path("segm_lite_v681.tflite"))
    sharded = shard_params(m.params, mesh)
    n_model_sharded = 0
    for k, v in sharded.items():
        spec = param_sharding_spec(k, m.params[k], mesh)
        if spec != jax.sharding.PartitionSpec():
            n_model_sharded += 1
            assert v.shape[-1] % mesh.shape["model"] == 0
    assert n_model_sharded > 10  # most conv kernels/biases get tp-sharded


@needs_8
def test_multi_stream_matches_single(rng):
    mesh = make_mesh(8)
    m = load_model(model_path("segm_lite_v681.tflite"))
    runner = MultiStreamRunner(m.raw_fn, m.params, mesh)
    xb = rng.random((8, 96, 160, 3), np.float32)
    y_sharded = np.asarray(runner(xb))
    y_single = np.asarray(m(xb))
    np.testing.assert_allclose(y_sharded, y_single, atol=2e-4, rtol=2e-4)


@needs_8
def test_train_step_dp_tp_sp(rng):
    from backscrub_tpu.train.trainer import Trainer, TrainConfig
    mesh = make_mesh(8)
    path = model_path("segm_lite_v681.tflite")
    m = load_model(path)
    tr = Trainer(m, spec_for_model(path), mesh=mesh,
                 config=TrainConfig(learning_rate=1e-3, spatial_shard=True))
    x = rng.random((4, 96, 160, 3), np.float32)
    t = (rng.random((4, 96, 160)) > 0.5).astype(np.float32)
    losses = [tr.step(x, t) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # fits the fixed batch


@needs_8
def test_train_deeplab_argmax_loss(rng):
    """The 21-class argmax_person loss path (uses jnp.delete under jit,
    odd 257x257 spatial dims on the mesh) trains and decreases."""
    from backscrub_tpu.train.trainer import Trainer, TrainConfig
    path = model_path("deeplabv3_257_mv_gpu.tflite")
    m = load_model(path)
    tr = Trainer(m, spec_for_model(path), mesh=make_mesh(8),
                 config=TrainConfig(learning_rate=1e-4))
    x = (rng.random((4, 257, 257, 3), np.float32) * 2 - 1)
    t = (rng.random((4, 257, 257)) > 0.5).astype(np.float32)
    losses = [tr.step(x, t) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    g.dryrun_multichip(min(8, len(jax.devices())))
