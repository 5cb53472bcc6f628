"""Convert reference PyTorch checkpoints (SemanticNetworkWithFPN, resnet
backbones) into this framework's flax variables.

Enables users of the reference to carry their trained weights over:
`convert_reichert_state_dict` maps a torch `state_dict` of
/root/reference/src/baselines/Reichert/semanticFCN_opt.py (resnet18/34/50
backbones) onto a `SemanticFPN` variables pytree. Forward parity of the
converted model vs the torch original is verified in
tests/test_torch_parity.py.

Layout transforms: torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O);
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

    # ---- trunk ----
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
