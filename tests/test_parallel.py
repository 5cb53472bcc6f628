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
        "model_settings": {"baseline": "Reichert", "model_type": "resnet10t",
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
    batch = {"range": np.ones((3, 8, 16, 1), np.float32),
             "reflectivity": np.ones((3, 8, 16, 1), np.float32),
             "xyz": np.ones((3, 8, 16, 3), np.float32),
             "normals": np.ones((3, 8, 16, 3), np.float32),
             "labels": np.ones((3, 8, 16), np.int64)}
    out = pm.shard_batch(batch, mesh, ignore_index=0)
    assert out["range"].shape[0] == 8
    # pad samples carry ignore_index labels and zeroed inputs — they must
    # contribute nothing to masked metrics (no sample repetition)
    assert np.asarray(out["labels"])[3:].max() == 0
    assert np.asarray(out["range"])[3:].max() == 0.0


def _synth_batch(n, h=32, w=64, seed=0):
    r = np.random.default_rng(seed)
    return {
        "range": r.random((n, h, w, 1), np.float32) * 50,
        "reflectivity": r.random((n, h, w, 1), np.float32),
        "xyz": r.standard_normal((n, h, w, 3)).astype(np.float32) * 10,
        "normals": r.standard_normal((n, h, w, 3)).astype(np.float32),
        "labels": r.integers(0, 20, (n, h, w)),
    }


def test_deterministic_spatial_sharded_forward_exact():
    """Dropout-off forward over a dp x sp mesh must match single-device
    near-exactly (fp32 atol ~1e-5) — catches halo-exchange / sharding bugs
    the loose stochastic-loss test cannot."""
    cfg = _cfg()
    model = registry.build_model(cfg)
    batch = _synth_batch(4)
    import jax.numpy as jnp
    inputs = registry.set_model_inputs(
        jnp.asarray(batch["range"]), jnp.asarray(batch["reflectivity"]),
        jnp.asarray(batch["xyz"]), jnp.asarray(batch["normals"]), cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, *inputs,
                           train=False)

    out1 = np.asarray(model.apply(variables, *inputs, train=False,
                                  stochastic=False))

    mesh = pm.make_mesh(8, data=4, model=2)
    sh = pm.batch_sharding(mesh, spatial=True)
    x = jax.device_put(np.asarray(inputs[0]), sh["range"])
    meta = jax.device_put(np.asarray(inputs[1]), sh["xyz"])
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False,
                                              stochastic=False))
    out2 = np.asarray(fwd(variables, x, meta))
    # fp32 fusion/reassociation noise only (atol 1e-4 on logits of |O(10)|);
    # a real halo/sharding bug shows up orders of magnitude larger
    np.testing.assert_allclose(out1, out2, atol=1e-4, rtol=1e-4)


# slow: duplicate coverage — the same sharded-eval==single-device and
# ragged-padding equalities are asserted every round by the driver-run
# __graft_entry__.dryrun_multichip sub-checks 3 (spatial) and 4 (ragged)
# on the flagship resnet18 config.
@pytest.mark.slow
def test_sharded_eval_step_matches_single_device_and_masks_ragged():
    """Sharded eval over a RAGGED batch (3 real samples on an 8-way mesh)
    must produce exactly the single-device statistics — pad samples are
    fully masked."""
    cfg = _cfg()
    model = registry.build_model(cfg)
    batch = _synth_batch(3)
    tr = Trainer(model, cfg)
    state = tr.create_state(batch, num_epochs=1, steps_per_epoch=1)
    rng = jax.random.PRNGKey(7)

    out1 = jax.device_get(tr._eval_step(state.params, state.batch_stats,
                                        batch, rng, tr.temp_scalar()))

    mesh = pm.make_mesh(8, data=8, model=1)
    tr2 = Trainer(model, cfg, mesh=mesh)
    state2 = tr2.create_state(batch, num_epochs=1, steps_per_epoch=1)
    out2 = jax.device_get(tr2._eval_step(
        state2.params, state2.batch_stats, tr2.place_batch(batch), rng,
        tr2.temp_scalar()))

    # pad pixels land only in the ignore-GT row, which compute() zeroes per
    # reference semantics (evaluator.py:29-105); all other rows are exact
    cm1 = np.asarray(out1["confmat"]).copy()
    cm2 = np.asarray(out2["confmat"]).copy()
    cm1[0] = cm2[0] = 0
    np.testing.assert_array_equal(cm1, cm2)
    # histogram statistics: fp reassociation under sharding can move a
    # handful of boundary pixels across bin edges (count drift +-1 per
    # pixel); bound the TOTAL drift to a few pixels out of ~6k valid ones
    n_pix = int((np.asarray(batch["labels"]) != 0).sum())
    for key in ("ece", "roc", "roc_mi", "rc", "ua"):
        for a, b in zip(out1[key], out2[key]):
            drift = np.abs(np.asarray(a, np.float64) -
                           np.asarray(b, np.float64)).sum()
            assert drift <= max(16, 1e-3 * n_pix), (key, drift)
    # class 0 is the ignore class (pads land there; dropped downstream via
    # ignore_ids=(0,)) — compare the real classes only
    drift = np.abs(out1["class_unc"][1:].astype(np.float64) -
                   out2["class_unc"][1:].astype(np.float64)).sum()
    assert drift <= max(16, 1e-3 * n_pix)


def test_trainer_mesh_epoch_end_to_end():
    """The product surface: Trainer(mesh=...) runs a train epoch + eval
    epoch on the virtual mesh through the normal loops."""
    cfg = _cfg()
    ds = SyntheticDataset(n_scans=6, projection=(32, 64), n_beams=32,
                          n_azimuth=64)
    loader = DataLoader(ds, batch_size=4)   # ragged final batch of 2
    mesh = pm.make_mesh(8, data=4, model=2)
    model = registry.build_model(cfg)
    tr = Trainer(model, cfg, mesh=mesh, spatial=True)
    batch0 = tr.place_batch(next(iter(loader)))
    state = tr.create_state(batch0, num_epochs=1, steps_per_epoch=2)
    state, stats = tr.train_one_epoch(state, loader, epoch=0)
    assert np.isfinite(stats["loss"])
    te = tr.test_one_epoch(state, loader)
    assert np.isfinite(te["mIoU"])
    # every real non-ignore pixel counted exactly once despite ragged padding
    # (pads land only in the zeroed-at-compute ignore row)
    n_real = sum(int((np.asarray(b["labels"]) != 0).sum()) for b in loader)
    assert int(tr.iou_evaluator.confmat[1:].sum()) == n_real


# slow: duplicate coverage — dryrun_multichip sub-check 2 (mc_shard) asserts
# this exact eval_batch routing + equality on the flagship config each round.
@pytest.mark.slow
def test_mc_eval_batch_routes_sample_sharding():
    """The PRODUCT path (Trainer.eval_batch) with MC on a mesh and a bs=1
    batch must use the sample-sharded eval step (batch replicated, T MC
    samples over "data") and produce the single-device statistics."""
    cfg = _cfg()
    cfg["model_settings"]["use_mc_sampling"] = 1
    cfg["model_settings"]["mc_samples"] = 8
    model = registry.build_model(cfg)
    batch = _synth_batch(1)
    rng = jax.random.PRNGKey(11)

    tr1 = Trainer(model, cfg)
    state1 = tr1.create_state(batch, num_epochs=1, steps_per_epoch=1)
    out1 = jax.device_get(tr1.eval_batch(
        state1.params, state1.batch_stats, batch, rng, tr1.temp_scalar()))

    mesh = pm.make_mesh(8, data=8, model=1)
    tr2 = Trainer(model, cfg, mesh=mesh)
    assert tr2._eval_step_mc_sharded is not None
    state2 = tr2.create_state(batch, num_epochs=1, steps_per_epoch=1)
    out2 = jax.device_get(tr2.eval_batch(
        state2.params, state2.batch_stats, batch, rng, tr2.temp_scalar()))

    # same rng -> same per-sample dropout keys -> identical MC math up to
    # fp reassociation (single-device runs a scan-accumulated tail, the
    # sharded step a fully batched one) — which can flip argmax on near-tie
    # pixels; bound the flips instead of demanding bit equality
    n_pix = int((np.asarray(batch["labels"]) != 0).sum())
    cm_drift = np.abs(np.asarray(out1["confmat"], np.float64) -
                      np.asarray(out2["confmat"], np.float64)).sum()
    assert cm_drift <= max(16, 2e-3 * n_pix), cm_drift
    for key in ("ece", "roc", "roc_mi", "rc", "ua"):
        for a, b in zip(out1[key], out2[key]):
            drift = np.abs(np.asarray(a, np.float64) -
                           np.asarray(b, np.float64)).sum()
            assert drift <= max(16, 1e-3 * n_pix), (key, drift)


# slow: duplicate coverage — the same sample-sharded==single-device MC law
# is asserted (through the product eval_batch route) by dryrun_multichip
# sub-check 2 every round, and the routing test above pins the Trainer glue.
@pytest.mark.slow
def test_mc_sample_sharding_matches_single_device():
    """T MC samples sharded over the data axis == single-device vmapped MC
    (same keys, same dropout masks), exactly."""
    from semanticlidarunc_tpu.prob import mc_dropout as mc

    cfg = _cfg()
    model = registry.build_model(cfg)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(3)
    x = jnp.asarray(rng.random((1, 32, 64, 2)), jnp.float32)
    meta = jnp.asarray(rng.standard_normal((1, 32, 64, 6)), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, meta,
                           train=False)

    ref_logits = mc.mc_forward(
        lambda v, *i, **kw: model.apply(v, *i, **kw),
        variables, (x, meta), key, 8)
    p_ref, h_ref, mi_ref = mc.mc_summaries(ref_logits)

    mesh = pm.make_mesh(8, data=8, model=1)
    p, h, mi = pm.shard_mc_summaries(model, mesh, variables, (x, meta),
                                     key, 8)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(mi_ref), atol=1e-5)

    with pytest.raises(ValueError):
        pm.shard_mc_summaries(model, mesh, variables, (x, meta), key, 6)
