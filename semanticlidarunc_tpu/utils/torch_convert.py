"""Convert reference PyTorch checkpoints (SemanticNetworkWithFPN) into this
framework's flax variables.

Enables users of the reference to carry their trained weights over:
`convert_reichert_state_dict` maps a torch `state_dict` of
/root/reference/src/baselines/Reichert/semanticFCN_opt.py onto a
`SemanticFPN` variables pytree, for the resnet{18,34,50},
shufflenet_v2_x{0_5,1_0,1_5,2_0}, regnet_y_{400mf,800mf,1_6gf,3_2gf},
efficientnet_v2_{s,m,l} and squeezenet1_0 backbone families — the FULL set
the reference model accepts (semanticFCN_opt.py:130-183), so any trained
reference checkpoint carries over. Forward parity of converted models vs
torch oracles with reference-identical state_dict naming is verified in
tests/test_torch_parity.py.

Layout transforms: torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O)
(identical for depthwise convs: torch (O, 1, kh, kw) -> flax (kh, kw, 1, O));
BatchNorm weight/bias -> scale/bias + running stats -> batch_stats.
"""
from __future__ import annotations

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _resnet_stage_sizes(backbone: str):
    return {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
            "resnet50": (3, 4, 6, 3)}[backbone]


def convert_reichert_state_dict(state_dict: dict, backbone: str,
                                num_classes: int) -> dict:
    """torch state_dict -> {"params": ..., "batch_stats": ...} for
    SemanticFPN(backbone=..., num_classes=...)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def bn(prefix, flax_mod, flax_name):
        set_in(params, (*flax_mod, flax_name, "scale"),
               sd[prefix + ".weight"])
        set_in(params, (*flax_mod, flax_name, "bias"), sd[prefix + ".bias"])
        set_in(stats, (*flax_mod, flax_name, "mean"),
               sd[prefix + ".running_mean"])
        set_in(stats, (*flax_mod, flax_name, "var"),
               sd[prefix + ".running_var"])

    def gn(prefix, flax_mod, flax_name):
        set_in(params, (*flax_mod, flax_name, "scale"),
               sd[prefix + ".weight"])
        set_in(params, (*flax_mod, flax_name, "bias"), sd[prefix + ".bias"])

    # ---- trunk (per backbone family) ----
    if backbone.startswith("shufflenet"):
        _shufflenet_trunk(sd, set_in, params, bn)
    elif backbone.startswith("regnet"):
        _regnet_trunk(sd, set_in, params, bn, backbone)
    elif backbone.startswith("efficientnet"):
        _efficientnet_trunk(sd, set_in, params, bn, backbone)
    elif backbone.startswith("squeezenet"):
        _squeezenet_trunk(sd, set_in, params)
    else:
        _resnet_trunk(sd, set_in, params, bn, backbone)

    # ---- FPN blocks (Conv+BN+ReLU sequentials) ----
    for i in (1, 2, 3, 4):
        t = f"fpn_block{i}"
        set_in(params, (t, "Conv_0", "kernel"), _conv(sd[f"{t}.0.weight"]))
        set_in(params, (t, "Conv_0", "bias"), sd[f"{t}.0.bias"])
        bn(f"{t}.1", (t,), "BatchNorm_0")

    # ---- attention ----
    for i in (1, 2, 3, 4):
        t = f"attention{i}"
        if f"{t}.proj.weight" in sd:
            set_in(params, (t, "Conv_0", "kernel"),
                   _conv(sd[f"{t}.proj.weight"]))
            set_in(params, (t, "Conv_1", "kernel"),
                   _conv(sd[f"{t}.score.weight"]))

    # ---- upsample blocks ----
    for i, name in ((4, "upsample_x4"), (3, "upsample_x3"),
                    (2, "upsample_x2")):
        t = f"upsample_layer_x{i}.block"
        set_in(params, (name, "Conv_0", "kernel"), _conv(sd[f"{t}.0.weight"]))
        gn(f"{t}.1", (name,), "GroupNorm_0")

    # ---- decoder (reference decoder_semantic indices 0,1,3,4,6,7) ----
    params["dec1_kernel"] = _conv(sd["decoder_semantic.0.weight"])
    gn("decoder_semantic.1", (), "dec1_gn")
    set_in(params, ("dec2", "Conv_0", "kernel"),
           _conv(sd["decoder_semantic.3.weight"]))
    gn("decoder_semantic.4", ("dec2",), "GroupNorm_0")
    set_in(params, ("dec_up", "Conv_0", "kernel"),
           _conv(sd["decoder_semantic.6.block.0.weight"]))
    gn("decoder_semantic.6.block.1", ("dec_up",), "GroupNorm_0")
    set_in(params, ("logits_conv", "kernel"),
           _conv(sd["decoder_semantic.7.weight"]))
    set_in(params, ("logits_conv", "bias"), sd["decoder_semantic.7.bias"])

    return {"params": params, "batch_stats": stats}


def _resnet_trunk(sd, set_in, params, bn, backbone):
    """torchvision resnet sliced as the reference does (stride-1 3x3 stem,
    layers 1-4; semanticFCN_opt.py:191-200)."""
    set_in(params, ("trunk", "Conv_0", "kernel"),
           _conv(sd["backbone.conv1.weight"]))
    sizes = _resnet_stage_sizes(backbone)
    bottleneck = backbone == "resnet50"
    blk = 0
    for stage, n_blocks in enumerate(sizes):
        for j in range(n_blocks):
            t = f"backbone.layer{stage + 1}.{j}"
            f = ("trunk", f"{'Bottleneck' if bottleneck else 'BasicBlock'}"
                          f"_{blk}")
            n_convs = 3 if bottleneck else 2
            for ci in range(n_convs):
                set_in(params, (*f, f"Conv_{ci}", "kernel"),
                       _conv(sd[f"{t}.conv{ci + 1}.weight"]))
                bn(f"{t}.bn{ci + 1}", f, f"BatchNorm_{ci}")
            if f"{t}.downsample.0.weight" in sd:
                set_in(params, (*f, f"Conv_{n_convs}", "kernel"),
                       _conv(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", f, f"BatchNorm_{n_convs}")
            blk += 1


def _shufflenet_trunk(sd, set_in, params, bn):
    """torchvision shufflenet_v2 sliced as the reference does (stride-1 stem
    conv, stages 2-4, conv5; semanticFCN_opt.py:228-237). Every variant has
    stage repeats (4, 8, 4); the flax ShuffleUnit's call-order param naming
    is proj (stride-2 units only: Conv_0 dw + Conv_1 1x1) then branch_main
    (1x1, dw, 1x1)."""
    set_in(params, ("trunk", "Conv_0", "kernel"),
           _conv(sd["backbone.conv1.0.weight"]))
    bn("backbone.conv1.1", ("trunk",), "BatchNorm_0")
    k = 0
    for stage, n in ((2, 4), (3, 8), (4, 4)):
        for j in range(n):
            t = f"backbone.stage{stage}.{j}"
            f = ("trunk", f"ShuffleUnit_{k}")
            if j == 0:     # stride-2 unit: torch branch1 -> flax proj convs
                pairs = [("branch1.0", 0), ("branch1.2", 1),
                         ("branch2.0", 2), ("branch2.3", 3), ("branch2.5", 4)]
                bns = [("branch1.1", 0), ("branch1.3", 1), ("branch2.1", 2),
                       ("branch2.4", 3), ("branch2.6", 4)]
            else:
                pairs = [("branch2.0", 0), ("branch2.3", 1), ("branch2.5", 2)]
                bns = [("branch2.1", 0), ("branch2.4", 1), ("branch2.6", 2)]
            for tname, ci in pairs:
                set_in(params, (*f, f"Conv_{ci}", "kernel"),
                       _conv(sd[f"{t}.{tname}.weight"]))
            for tname, ci in bns:
                bn(f"{t}.{tname}", f, f"BatchNorm_{ci}")
            k += 1
    set_in(params, ("trunk", "Conv_1", "kernel"),
           _conv(sd["backbone.conv5.0.weight"]))
    bn("backbone.conv5.1", ("trunk",), "BatchNorm_1")


def _regnet_trunk(sd, set_in, params, bn, backbone):
    """torchvision regnet_y sliced as the reference does (stride-1 stem,
    trunk_output blocks 1-4; semanticFCN_opt.py:219-226). Flax YBlock naming:
    Conv_0/1 = f.a/f.b, SqueezeExcite_0.Conv_0/1 = f.se.fc1/fc2,
    Conv_2 = f.c, Conv_3 = proj (first block of each stage)."""
    from ..models.backbones import BACKBONE_SPECS

    set_in(params, ("trunk", "Conv_0", "kernel"),
           _conv(sd["backbone.stem.0.weight"]))
    bn("backbone.stem.1", ("trunk",), "BatchNorm_0")
    depths = BACKBONE_SPECS[backbone]["depths"]
    k = 0
    for s, d in enumerate(depths, start=1):
        for j in range(d):
            t = f"backbone.trunk_output.block{s}.block{s}-{j}"
            f = ("trunk", f"YBlock_{k}")
            for tname, ci in (("f.a.0", 0), ("f.b.0", 1), ("f.c.0", 2)):
                set_in(params, (*f, f"Conv_{ci}", "kernel"),
                       _conv(sd[f"{t}.{tname}.weight"]))
            for tname, ci in (("f.a.1", 0), ("f.b.1", 1), ("f.c.1", 2)):
                bn(f"{t}.{tname}", f, f"BatchNorm_{ci}")
            for fc, ci in (("fc1", 0), ("fc2", 1)):
                set_in(params, (*f, "SqueezeExcite_0", f"Conv_{ci}", "kernel"),
                       _conv(sd[f"{t}.f.se.{fc}.weight"]))
                set_in(params, (*f, "SqueezeExcite_0", f"Conv_{ci}", "bias"),
                       sd[f"{t}.f.se.{fc}.bias"])
            if f"{t}.proj.0.weight" in sd:
                set_in(params, (*f, "Conv_3", "kernel"),
                       _conv(sd[f"{t}.proj.0.weight"]))
                bn(f"{t}.proj.1", f, "BatchNorm_3")
            k += 1


def _efficientnet_trunk(sd, set_in, params, bn, backbone):
    """torchvision efficientnet_v2 sliced as the reference does: stem =
    features[0] (3x3 conv replaced stride-1), layers 1-3 = features[2..4]
    (features[1] and [5:] are never executed in the multi-scale-meta path;
    semanticFCN_opt.py:239-246, 396-404). Flax naming: FusedMBConv_k for the
    two fused stages, MBConv_j for the SE stage; torchvision block layout:
    block.0 = expand ConvNormAct, block.1 = (fused: project | mb: depthwise),
    block.2 = SE (mb only), block.3 = project (mb only)."""
    from ..models.backbones import BACKBONE_SPECS

    set_in(params, ("trunk", "Conv_0", "kernel"),
           _conv(sd["backbone.features.0.0.weight"]))
    bn("backbone.features.0.1", ("trunk",), "BatchNorm_0")
    sizes = BACKBONE_SPECS[backbone]["stage_sizes"]
    k = 0
    for stage_idx, n in zip((2, 3), sizes[:2]):
        for j in range(n):
            t = f"backbone.features.{stage_idx}.{j}.block"
            f = ("trunk", f"FusedMBConv_{k}")
            set_in(params, (*f, "Conv_0", "kernel"),
                   _conv(sd[f"{t}.0.0.weight"]))
            bn(f"{t}.0.1", f, "BatchNorm_0")
            set_in(params, (*f, "Conv_1", "kernel"),
                   _conv(sd[f"{t}.1.0.weight"]))
            bn(f"{t}.1.1", f, "BatchNorm_1")
            k += 1
    for j in range(sizes[2]):
        t = f"backbone.features.4.{j}.block"
        f = ("trunk", f"MBConv_{j}")
        set_in(params, (*f, "Conv_0", "kernel"), _conv(sd[f"{t}.0.0.weight"]))
        bn(f"{t}.0.1", f, "BatchNorm_0")
        set_in(params, (*f, "Conv_1", "kernel"), _conv(sd[f"{t}.1.0.weight"]))
        bn(f"{t}.1.1", f, "BatchNorm_1")
        for fc, ci in (("fc1", 0), ("fc2", 1)):
            set_in(params, (*f, "SqueezeExcite_0", f"Conv_{ci}", "kernel"),
                   _conv(sd[f"{t}.2.{fc}.weight"]))
            set_in(params, (*f, "SqueezeExcite_0", f"Conv_{ci}", "bias"),
                   sd[f"{t}.2.{fc}.bias"])
        set_in(params, (*f, "Conv_2", "kernel"), _conv(sd[f"{t}.3.0.weight"]))
        bn(f"{t}.3.1", f, "BatchNorm_2")


def _squeezenet_trunk(sd, set_in, params):
    """torchvision squeezenet1_0 sliced as the reference does (stem =
    features[0:4] with a bias-free replaced 3x3 conv, fires at features
    indices 3,4,5,7,8,9,10,12; semanticFCN_opt.py:205-215). No BatchNorm
    anywhere; every Fire conv carries a bias."""
    set_in(params, ("trunk", "Conv_0", "kernel"),
           _conv(sd["backbone.features.0.weight"]))
    for k, idx in enumerate((3, 4, 5, 7, 8, 9, 10, 12)):
        t = f"backbone.features.{idx}"
        f = ("trunk", f"Fire_{k}")
        for tname, ci in (("squeeze", 0), ("expand1x1", 1),
                          ("expand3x3", 2)):
            set_in(params, (*f, f"Conv_{ci}", "kernel"),
                   _conv(sd[f"{t}.{tname}.weight"]))
            set_in(params, (*f, f"Conv_{ci}", "bias"),
                   sd[f"{t}.{tname}.bias"])


def apply_converted(variables_init: dict, converted: dict) -> dict:
    """Overlay converted leaves onto a freshly-initialized variables tree
    (errors on shape mismatches so silent misconversion can't slip by)."""
    import jax

    flat_init = {jax.tree_util.keystr(p): (p, v) for p, v in
                 jax.tree_util.tree_flatten_with_path(variables_init)[0]}
    flat_conv = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(converted)[0]}
    missing = sorted(set(flat_init) - set(flat_conv))
    extra = sorted(set(flat_conv) - set(flat_init))
    if extra:
        raise KeyError(f"converted keys not in model: {extra[:5]}")
    out = {}
    for key, (path, leaf) in flat_init.items():
        if key in flat_conv:
            cand = np.asarray(flat_conv[key])
            if cand.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch at {key}: {cand.shape} vs {leaf.shape}")
            out[path] = cand.astype(np.asarray(leaf).dtype)
        else:
            out[path] = leaf
    treedef = jax.tree_util.tree_structure(variables_init)
    leaves = [out[p] for p, _ in
              jax.tree_util.tree_flatten_with_path(variables_init)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves), missing
