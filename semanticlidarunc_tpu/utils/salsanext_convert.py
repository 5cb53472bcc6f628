"""Convert reference SalsaNext torch checkpoints to flax variables.

Maps the state_dict of /root/reference/src/baselines/SalsaNext/SalsaNext.py
(verbatim upstream SalsaNext) onto models.salsanext.SalsaNext variables.
Direct forward parity against the actual reference module (imported as the
test oracle — it depends only on torch) is verified in
tests/test_torch_parity.py.
"""
from __future__ import annotations

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_salsanext_state_dict(state_dict: dict) -> dict:
    """torch state_dict -> {"params", "batch_stats"} for SalsaNext.

    Flax module layout (models/salsanext.py): three ResContextBlock_{0..2},
    five ResBlock_{0..4}, four UpBlock_{0..3}, final Conv_0. Within each
    block, Conv_i in definition order and _BN_i wrappers holding BatchNorm_0.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv(tp, fmod, fname, bias=True):
        set_in(params, (*fmod, fname, "kernel"), _conv(sd[tp + ".weight"]))
        if bias and tp + ".bias" in sd:
            set_in(params, (*fmod, fname, "bias"), sd[tp + ".bias"])

    def bn(tp, fmod, bn_idx):
        f = (*fmod, f"_BN_{bn_idx}", "BatchNorm_0")
        set_in(params, (*f, "scale"), sd[tp + ".weight"])
        set_in(params, (*f, "bias"), sd[tp + ".bias"])
        set_in(stats, (*f, "mean"), sd[tp + ".running_mean"])
        set_in(stats, (*f, "var"), sd[tp + ".running_var"])

    # ResContextBlocks: conv1(1x1), conv2(3x3)+bn1, conv3(3x3,d2)+bn2
    for i, t in enumerate(("downCntx", "downCntx2", "downCntx3")):
        f = (f"ResContextBlock_{i}",)
        conv(f"{t}.conv1", f, "Conv_0")
        conv(f"{t}.conv2", f, "Conv_1")
        bn(f"{t}.bn1", f, 0)
        conv(f"{t}.conv3", f, "Conv_2")
        bn(f"{t}.bn2", f, 1)

    # ResBlocks: conv1(1x1 shortcut), conv2..conv4 (+bn1..bn3), conv5+bn4
    for i in range(5):
        t = f"resBlock{i + 1}"
        f = (f"ResBlock_{i}",)
        conv(f"{t}.conv1", f, "Conv_0")
        conv(f"{t}.conv2", f, "Conv_1")
        bn(f"{t}.bn1", f, 0)
        conv(f"{t}.conv3", f, "Conv_2")
        bn(f"{t}.bn2", f, 1)
        conv(f"{t}.conv4", f, "Conv_3")
        bn(f"{t}.bn3", f, 2)
        conv(f"{t}.conv5", f, "Conv_4")
        bn(f"{t}.bn4", f, 3)

    # UpBlocks: conv1..conv3 (+bn1..bn3), conv4+bn4
    for i in range(4):
        t = f"upBlock{i + 1}"
        f = (f"UpBlock_{i}",)
        conv(f"{t}.conv1", f, "Conv_0")
        bn(f"{t}.bn1", f, 0)
        conv(f"{t}.conv2", f, "Conv_1")
        bn(f"{t}.bn2", f, 1)
        conv(f"{t}.conv3", f, "Conv_2")
        bn(f"{t}.bn3", f, 2)
        conv(f"{t}.conv4", f, "Conv_3")
        bn(f"{t}.bn4", f, 3)

    conv("logits", (), "Conv_0")
    return {"params": params, "batch_stats": stats}
