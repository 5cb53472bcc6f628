"""Tester: standalone evaluation driver with an outputs-summary cache.

Port of /root/reference/src/models/tester.py. Behavior parity:
- loads a checkpoint, runs the full eval loop (plain / Dirichlet / MC paths
  via the Trainer's compiled eval step), writes result_dict.json with
  NaN -> null (:210-236) and the plot set (acc-vs-unc, ECE, ROC, ROC-MI,
  ridgeline, boxplot + risk-coverage; :658-720);
- outputs-summary cache: all aggregator sufficient statistics are serialized
  to `outputs_summary/summary_<name>.npz`; a rerun over the same frame count
  restores them and skips inference entirely (:301-365, 615-654). Because our
  aggregators are fixed-shape histograms (not reservoirs) the cache is a few
  hundred KB instead of many-million-row tensors.
"""
from __future__ import annotations

import json
import math
import os
import time

import jax
import numpy as np

from ..metrics import uncertainty as unc_m
from . import checkpoint as ckpt
from .trainer import Trainer


def _clean_nans(obj):
    if isinstance(obj, dict):
        return {k: _clean_nans(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_clean_nans(v) for v in obj]
    if isinstance(obj, float):
        return None if math.isnan(obj) else obj
    return obj


class Tester:
    def __init__(self, model, cfg: dict, checkpoint: str | None = None,
                 logging: bool = False, out_dir: str = "", seed: int = 0,
                 visualize: bool = False, mesh=None, spatial: bool = False):
        self.cfg = cfg
        self.logging = logging
        self.visualize = visualize
        self.out_dir = out_dir or cfg["extras"].get("save_path", "") or "."
        self.checkpoint = checkpoint
        self.trainer = Trainer(model, cfg, seed=seed, mesh=mesh,
                               spatial=spatial)
        # apply a previously fitted temperature if one sits next to the ckpt
        if checkpoint:
            from ..prob.temp_scaling import load_temperature
            t_path = os.path.join(os.path.dirname(checkpoint),
                                  "temperature.json")
            T = load_temperature(t_path)
            if T is not None:
                self.trainer.temperature = T
                print(f"[Tester] using temperature T={T:.4f} from {t_path}")
        self.unc_agg = unc_m.UncertaintyPerClassAggregator(
            num_classes=self.trainer.num_classes)
        self.ua_agg = unc_m.UncertaintyAccuracyAggregator()
        self.variables = None
        self._restore_report = None
        self._extra_stats = {}

    def _load_variables(self, sample_batch):
        state = self.trainer.create_state(sample_batch, num_epochs=1,
                                          steps_per_epoch=1,
                                          pretrained=self.checkpoint)
        self.state = state
        if self.checkpoint:
            print(f"[Tester] checkpoint: {self.checkpoint}")
        return state

    # ---------- outputs-summary cache ----------
    def _cache_path(self, epoch_name: str) -> str:
        d = os.path.join(self.out_dir, "outputs_summary")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"summary_{epoch_name}.npz")

    def _save_cache(self, path: str, n_frames: int):
        t = self.trainer
        extra = {f"x_{k}_{i}": np.asarray(v) for k, pair in
                 self._extra_stats.items() for i, v in enumerate(pair)}
        np.savez_compressed(
            path, n_frames=n_frames, confmat=t.iou_evaluator.confmat,
            ece_count=t.ece_eval.count, ece_conf=t.ece_eval.s_conf,
            ece_corr=t.ece_eval.s_corr,
            roc_err=t.auroc_eval.h_err, roc_ok=t.auroc_eval.h_ok,
            roc_mi_err=t.auroc_eval_mi.h_err, roc_mi_ok=t.auroc_eval_mi.h_ok,
            rc_cnt=t.aurc_eval.cnt, rc_err=t.aurc_eval.err,
            unc_hist=self.unc_agg.hist,
            ua_cnt=self.ua_agg.cnt, ua_cor=self.ua_agg.cor, **extra)

    def _try_load_cache(self, path: str, n_frames: int) -> bool:
        if not os.path.exists(path):
            return False
        try:
            z = np.load(path)
            if int(z["n_frames"]) != n_frames:
                return False
            t = self.trainer
            if z["ece_count"].shape != t.ece_eval.count.shape:
                return False  # stale cache from a different stat layout
            t.iou_evaluator.confmat = z["confmat"].astype(np.int64)
            t.ece_eval.count, t.ece_eval.s_conf, t.ece_eval.s_corr = \
                z["ece_count"], z["ece_conf"], z["ece_corr"]
            t.auroc_eval.h_err, t.auroc_eval.h_ok = z["roc_err"], z["roc_ok"]
            t.auroc_eval_mi.h_err, t.auroc_eval_mi.h_ok = \
                z["roc_mi_err"], z["roc_mi_ok"]
            t.aurc_eval.cnt, t.aurc_eval.err = z["rc_cnt"], z["rc_err"]
            self.unc_agg.hist = z["unc_hist"]
            self.ua_agg.cnt, self.ua_agg.cor = z["ua_cnt"], z["ua_cor"]
            self._extra_stats = {}
            for key in ("ee", "er", "mcrel"):
                if f"x_{key}_0" in z:
                    self._extra_stats[key] = (z[f"x_{key}_0"],
                                              z[f"x_{key}_1"])
            print(f"[Tester] restored outputs summary from {path}; "
                  "skipping inference")
            return True
        except Exception as e:  # noqa: BLE001 — cache falls back to recompute
            print(f"[Tester] cache load failed ({e}); recomputing")
            return False

    # ---------- main ----------
    def run(self, dataloader_test, mc_samples: int | None = None,
            epoch_name: str | None = None):
        t = self.trainer
        if mc_samples is not None and t.use_mc_sampling:
            t.mc_samples = int(mc_samples)
        if epoch_name is None:
            base = os.path.basename(self.checkpoint or "model")
            epoch_name = os.path.splitext(base)[0] or "model"

        batches = list(dataloader_test) if not hasattr(
            dataloader_test, "__len__") else None
        loader = batches if batches is not None else dataloader_test
        n_frames = sum(1 for _ in iter(loader)) if batches is not None else \
            len(dataloader_test)

        for agg in (t.iou_evaluator, t.ece_eval, t.auroc_eval,
                    t.auroc_eval_mi, t.aurc_eval, self.unc_agg, self.ua_agg):
            agg.reset()
        # entropy-error / entropy-reliability / MC-Dirichlet-reliability
        # sufficient statistics (reference probability_helper.py:339-450)
        self._extra_stats = {}

        cache = self._cache_path(epoch_name)
        ran_inference = False
        infer_ms = []
        if self._try_load_cache(cache, n_frames):
            if self.visualize:
                # metrics come from the cache, but visualization needs live
                # forwards — run them anyway (previously this was silently
                # skipped on a cache hit)
                print("[Tester] cache hit with --visualization: running "
                      "forward passes for the panel (metrics stay cached)")
                first = True
                for batch in iter(loader):
                    if first:
                        self._load_variables(batch)
                        first = False
                    self._visualize_batch(batch)
        else:
            ran_inference = True
            first = None
            for batch in iter(loader):
                if first is None:
                    first = batch
                    self._load_variables(batch)
                t.rng, eval_rng = jax.random.split(t.rng)
                t0 = time.perf_counter()
                out = t.eval_batch(self.state.params, self.state.batch_stats,
                                   batch, eval_rng, t.temp_scalar())
                out = jax.device_get(out)
                infer_ms.append((time.perf_counter() - t0) * 1e3)
                t.iou_evaluator.update_confmat(out["confmat"])
                t.ece_eval.update_stats(*out["ece"])
                t.auroc_eval.update_stats(*out["roc"])
                t.auroc_eval_mi.update_stats(*out["roc_mi"])
                t.aurc_eval.cnt += np.asarray(out["rc"][0], np.float64)
                t.aurc_eval.err += np.asarray(out["rc"][1], np.float64)
                self.unc_agg.update_stats(out["class_unc"])
                self.ua_agg.update_stats(*out["ua"])
                for key in ("ee", "er", "mcrel"):
                    if key in out:
                        a, b = (np.asarray(v, np.float64)
                                for v in out[key])
                        if key in self._extra_stats:
                            pa, pb = self._extra_stats[key]
                            self._extra_stats[key] = (pa + a, pb + b)
                        else:
                            self._extra_stats[key] = (a, b)
                if self.visualize:
                    self._visualize_batch(batch)
            self._save_cache(cache, n_frames)

        miou, per_class = t.iou_evaluator.compute(
            class_names=t.class_names, test_mask=t.test_mask,
            ignore_gt=[t.ignore_index])
        os.makedirs(self.out_dir, exist_ok=True)
        (ece, mce), _ = t.ece_eval.compute(
            save_plot_path=os.path.join(self.out_dir,
                                        f"ece_{epoch_name}.png"))
        auroc, _ = t.auroc_eval.compute(
            save_plot_path=os.path.join(self.out_dir,
                                        f"roc_{epoch_name}.png"))
        auroc_mi, _ = t.auroc_eval_mi.compute(
            save_plot_path=os.path.join(self.out_dir,
                                        f"roc_mi_{epoch_name}.png"))
        rc = t.aurc_eval.compute()
        from ..metrics.aurc import plot_rc_curves
        plot_rc_curves(rc, save_path=os.path.join(
            self.out_dir, f"risk_coverage_{epoch_name}.png"))
        self.ua_agg.plot(save_path=os.path.join(
            self.out_dir, f"acc_vs_unc_{epoch_name}.png"))
        entropy_ece = None
        if "ee" in self._extra_stats:
            from ..prob import dirichlet as pdl
            from ..utils import reliability as rel
            import matplotlib.pyplot as plt
            inter, union = self._extra_stats["ee"]
            ee_iou = np.divide(inter, union, out=np.zeros_like(inter),
                               where=union > 0)
            fig = pdl.plot_entropy_error_iou(
                ee_iou, np.asarray(t.ee_thresholds),
                save_path=os.path.join(
                    self.out_dir, f"entropy_error_iou_{epoch_name}.png"))
            plt.close(fig)
            totals, errors = self._extra_stats["er"]
            rate, entropy_ece = pdl.entropy_reliability_ece(totals, errors)
            rel.plot_reliability(
                rate, (np.arange(rate.size) + 0.5) / rate.size, totals,
                os.path.join(self.out_dir,
                             f"entropy_reliability_{epoch_name}.png"),
                title=("Entropy reliability\n(does predictive entropy "
                       "predict error frequency?)"),
                xlabel="Predictive entropy (norm)", ylabel="Error rate")
            if "mcrel" in self._extra_stats:
                hits, totals_m = self._extra_stats["mcrel"]
                acc_m = np.divide(hits, totals_m, out=np.zeros_like(hits),
                                  where=totals_m > 0)
                rel.plot_reliability(
                    acc_m, (np.arange(acc_m.size) + 0.5) / acc_m.size,
                    totals_m,
                    os.path.join(self.out_dir,
                                 f"mc_reliability_{epoch_name}.png"),
                    title=("MC-Dirichlet reliability\n(argmax-agreement "
                           "confidence vs 1-shot correctness)"))
        if t.class_names:
            cmap = self.cfg["extras"].get("class_colors", {})
            self.unc_agg.plot_ridgeline(
                t.class_names, cmap, ignore_ids=(0,),
                save_path=os.path.join(self.out_dir,
                                       f"ridgeline_{epoch_name}.png"))
            self.unc_agg.plot_boxplot(
                t.class_names, cmap, ignore_ids=(0,),
                save_path=os.path.join(self.out_dir,
                                       f"unc_boxplot_{epoch_name}.png"))
            unc_m.plot_iou_sorted_by_uncertainty(
                per_class, self.unc_agg.class_stats(ignore_ids=(0,)),
                t.class_names, cmap,
                save_path=os.path.join(self.out_dir,
                                       f"iou_by_unc_{epoch_name}.png"))

        result = dict(per_class)
        result["mIoU"] = miou
        self.save_results(result, self.out_dir, extra={
            "ECE": ece, "MCE": mce, "AUROC": auroc, "AUROC_MI": auroc_mi,
            "AURC": rc["AURC"], "EAURC": rc["EAURC"],
            "entropy_ECE": entropy_ece,
            "top_k_error_recall": {int(k): float(v) for k, v in
                                   zip(rc["ks"], rc["recalls"])},
            "median_inference_ms": (float(np.median(infer_ms))
                                    if infer_ms else None),
            "ran_inference": ran_inference,
        })
        return result

    def _visualize_batch(self, batch):
        """Interactive panel frame: gt/pred class colors, reflectivity,
        normals, plus lazy Dirichlet uncertainty layers (reference
        tester/trainer viz path; headless-safe)."""
        import jax.numpy as jnp
        import numpy as np_

        from ..models import registry
        from ..prob import dirichlet as pdl
        from ..utils import viz, viz_panel

        t = self.trainer
        inputs = registry.set_model_inputs(
            jnp.asarray(batch["range"]), jnp.asarray(batch["reflectivity"]),
            jnp.asarray(batch["xyz"]), jnp.asarray(batch["normals"]),
            self.cfg)
        out = t.model.apply(
            {"params": self.state.params,
             **({"batch_stats": self.state.batch_stats}
                if self.state.batch_stats is not None else {})},
            *inputs, train=False, stochastic=False)
        if isinstance(out, (list, tuple)):
            out = out[0]
        colors = self.cfg["extras"].get("class_colors", {})
        preds = np_.asarray(jnp.argmax(
            t.predictions_from_outputs(out), -1))[0]
        gt = np_.asarray(batch["labels"][0])
        refl = np_.asarray(batch["reflectivity"][0, ..., 0])
        nrm = np_.asarray(batch["normals"][0])
        base = {
            "reflectivity": np_.uint8(
                255 * np_.repeat(np_.clip(refl, 0, 1)[..., None], 3, -1)),
            "normals": np_.uint8(255 * (nrm + 1) / 2),
            "prediction": viz.colorize_labels(preds, colors),
            "ground_truth": viz.colorize_labels(gt, colors),
        }
        optional = {}
        if t.loss_name == "Dirichlet":
            sh, sc = pdl.split_dirichlet_logits(out, t.num_classes)
            alpha = pdl.to_alpha_shape_scale(sh, sc)
            for name in ("H_norm", "AU_norm", "EU_norm", "alpha0", "AU_frac",
                         "EU_frac", "EU_minus_AU_frac"):
                optional[name] = (lambda n=name: viz.build_uncertainty_layers(
                    alpha, [n])[n])
            viz_panel.register_optional_names(list(optional),
                                              default_enabled=False)
        viz_panel.create_ia_plots(
            base, optional,
            (np_.asarray(batch["xyz"][0]), base["prediction"]),
            enable=True)

    def save_results(self, result_dict, out_dir, extra=None):
        per_class = {k: v for k, v in result_dict.items() if k != "mIoU"}
        out = {"iou": per_class, "mIoU": result_dict.get("mIoU"),
               "checkpoint": self.checkpoint}
        if extra:
            out.update(extra)
        out = _clean_nans(out)
        path = os.path.join(out_dir, "result_dict.json")
        os.makedirs(out_dir, exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=4)
        print(f"Saved results to {path}")
        return path
