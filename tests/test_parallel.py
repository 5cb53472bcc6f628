"""Multi-chip sharding on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlidarunc_tpu.dataset.pipeline import DataLoader, SyntheticDataset
from semanticlidarunc_tpu.models import registry
from semanticlidarunc_tpu.parallel import mesh as pm
from semanticlidarunc_tpu.train.trainer import Trainer
from semanticlidarunc_tpu.utils import config as cfg_util


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg():
    return cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {"baseline": "Reichert", "model_type": "resnet18",
                           "loss_function": "CE", "attention": True,
                           "multi_scale_meta": True, "normals": True,
                           "reflectivity": True, "projection": [32, 64]},
        "train_params": {"learning_rate": 1e-3, "batch_size": 4,
                         "num_epochs": 1, "num_warmup_epochs": 0},
    })


def test_data_parallel_train_step_matches_single_device():
    cfg = _cfg()
    ds = SyntheticDataset(n_scans=4, projection=(32, 64), n_beams=32,
                          n_azimuth=64)
    loader = DataLoader(ds, batch_size=4)
    batch = next(iter(loader))
    model = registry.build_model(cfg)
    tr = Trainer(model, cfg)
    state = tr.create_state(batch, num_epochs=1, steps_per_epoch=1)

    # single-device step
    rng = jax.random.PRNGKey(0)
    w = tr._weights_vec()
    state1, m1 = tr._train_step(state, batch, w, rng)

    # dp=4 x sp=2 mesh step; same seed -> identical initial params
    mesh = pm.make_mesh(8, data=4, model=2)
    tr2 = Trainer(model, cfg)
    state_b = tr2.create_state(batch, num_epochs=1, steps_per_epoch=1)
    sharded_step = pm.shard_train_step(tr2._train_step.__wrapped__, mesh,
                                       spatial=True)
    sbatch = pm.shard_batch(batch, mesh, spatial=True)
    state2, m2 = sharded_step(state_b, sbatch, w, rng)

    assert np.isfinite(float(m2["loss"]))
    # dropout RNG positioning differs under sharding, so losses are close but
    # not bit-equal; confusion matrices must agree exactly (deterministic fwd
    # is BN-batch-stat dependent -> compare totals instead)
    assert abs(float(m1["loss"]) - float(m2["loss"])) / float(m1["loss"]) < 0.05
    assert int(np.asarray(m2["confmat"]).sum()) == batch["labels"].size


def test_mesh_shapes():
    mesh = pm.make_mesh(8, data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = pm.make_mesh(8)
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_shard_batch_pads_ragged():
    mesh = pm.make_mesh(8)
    batch = {"range": np.zeros((3, 8, 16, 1), np.float32),
             "reflectivity": np.zeros((3, 8, 16, 1), np.float32),
             "xyz": np.zeros((3, 8, 16, 3), np.float32),
             "normals": np.zeros((3, 8, 16, 3), np.float32),
             "labels": np.zeros((3, 8, 16), np.int64)}
    out = pm.shard_batch(batch, mesh)
    assert out["range"].shape[0] == 8
