"""CPU correctness check: tools/exp_mc_tail._flat_tail vs the production
XLA tail (mc_fused_summaries path) on a tiny FPN. Run:
    python tools/check_flat_tail.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from semanticlidarunc_tpu.models import registry
from semanticlidarunc_tpu.prob import mc_dropout as mc
from semanticlidarunc_tpu.utils import config as cfg_util
from tools.exp_mc_tail import _flat_tail

H, W, T = 16, 64, 4


def main():
    cfg = cfg_util.with_extras({
        "dataset_name": "SemanticKitti",
        "model_settings": {
            "baseline": "Reichert", "model_type": "resnet18",
            "loss_function": "CE", "attention": True,
            "multi_scale_meta": True, "normals": True, "reflectivity": True,
            "projection": [H, W],
        },
        "train_params": {},
    })
    model = registry.build_model(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, H, W, 2))
    meta = jax.random.normal(jax.random.fold_in(key, 1), (1, H, W, 6))
    variables = model.init({"params": key, "dropout": key}, x, meta,
                           train=False)
    fused = model.apply(variables, x, meta, train=False,
                        method=model.features)
    y1 = model.apply(variables, fused, key, T, method=model.head_mc_pre)

    # production tail: per-sample head_post_phase scan
    def prod(y1):
        def sbody(carry, y_t):
            p_sum, h_sum = carry
            logits = model.apply(variables, y_t,
                                 method=model.head_post_phase)
            logp = jax.nn.log_softmax(logits, axis=-1)
            p = jnp.exp(logp)
            h = -jnp.sum(p * logp, axis=-1)
            return (p_sum + p, h_sum + h), None
        probe = jax.eval_shape(
            lambda v, yy: model.apply(v, yy[0], method=model.head_post_phase),
            variables, y1)
        init = (jnp.zeros(probe.shape, jnp.float32),
                jnp.zeros(probe.shape[:-1], jnp.float32))
        (p_sum, h_sum), _ = jax.lax.scan(sbody, init, y1)
        return p_sum, h_sum

    p_ref, h_ref = prod(y1)                      # [B,h,w,2,2,K], [B,h,w,2,2]
    wl = variables["params"]["logits_conv"]["kernel"][0, 0]
    bl = variables["params"]["logits_conv"]["bias"]
    p_v2, h_v2 = _flat_tail(model, variables, y1, wl, bl)
    b, h, w, s, s2, k = p_ref.shape
    p_v2 = p_v2.reshape(b, h, w, s * s2 * k)
    h_v2 = h_v2.reshape(b, h, w, s * s2)
    p_ref = p_ref.reshape(b, h, w, s * s2 * k)
    h_ref = h_ref.reshape(b, h, w, s * s2)

    dp = np.abs(np.asarray(p_v2 - p_ref))
    dh = np.abs(np.asarray(h_v2 - h_ref))
    print("max |dp| =", dp.max(), " max |dh| =", dh.max())
    assert dp.max() < 1e-5 and dh.max() < 1e-4, "flat tail mismatch"
    print("OK")


if __name__ == "__main__":
    main()
