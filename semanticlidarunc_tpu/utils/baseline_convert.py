"""Convert reference CENet / FIDNet torch checkpoints to flax variables.

Completes the checkpoint-migration surface: together with
`utils/torch_convert.py` (Reichert FPN, every backbone family) and
`utils/salsanext_convert.py`, every model family the reference can train
(`/root/reference/src/baselines/`) now carries its trained weights over.

Reference module layouts:
- CENet HarDNet trunk: `src/baselines/CENet/CENet_HardDNet.py:188-330`
  (`model.base.{0,1,2}` stem ConvLayers, `base.{3,6,9,12}.layers.*`
  HarDBlocks, `base.{4,7,10,13}` 1x1 transition ConvLayers, `conv_1`,
  `conv_2`, `semantic_output`, `aux_head{1,2,3}`).
- CENet ResNet_34 trunk: `src/baselines/CENet/CENet_ResNet34.py:91-196`
  (`conv1..conv3` BasicConvs, `layer{1..4}` BasicBlocks with optional
  `downsample`, `conv_1`, `conv_2`, heads).
- FIDNet (default ResNet34_aspp_1): `src/baselines/FIDNet/ResNet.py:172-300`
  (`backend.conv1` (biased 1x1), `backend.conv2`, `backend.bn`,
  `backend.layer{1..4}`, `backend.conv_Aspp_{1,2,3}` + `bn{1,2,3}`,
  `semantic_head.{conv_1,bn1,conv_2,bn2,semantic_output}`).

Forward parity against the actual reference modules (imported as torch-only
test oracles) is verified in tests/test_torch_parity.py.
"""
from __future__ import annotations

import numpy as np


def _conv(w) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


class _Mapper:
    def __init__(self, state_dict: dict):
        self.sd = {k: np.asarray(v) for k, v in state_dict.items()}
        self.params: dict = {}
        self.stats: dict = {}

    def _set(self, tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv(self, tp, fmod, fname):
        self._set(self.params, (*fmod, fname, "kernel"),
                  _conv(self.sd[tp + ".weight"]))
        if tp + ".bias" in self.sd:
            self._set(self.params, (*fmod, fname, "bias"),
                      self.sd[tp + ".bias"])

    def bn(self, tp, fmod, fname):
        self._set(self.params, (*fmod, fname, "scale"),
                  self.sd[tp + ".weight"])
        self._set(self.params, (*fmod, fname, "bias"), self.sd[tp + ".bias"])
        self._set(self.stats, (*fmod, fname, "mean"),
                  self.sd[tp + ".running_mean"])
        self._set(self.stats, (*fmod, fname, "var"),
                  self.sd[tp + ".running_var"])

    def basic_conv(self, tp, fmod, conv_name="conv", norm_name="norm"):
        """Reference ConvLayer/BasicConv (conv+BN) -> flax BasicConv."""
        self.conv(f"{tp}.{conv_name}", fmod, "Conv_0")
        self.bn(f"{tp}.{norm_name}", fmod, "BatchNorm_0")

    def leaky_block(self, tp, fmod):
        """Reference BasicBlock (conv1/bn1, conv2/bn2, optional downsample)
        -> flax LeakyBasicBlock (Conv_0/1/2, BatchNorm_0/1/2)."""
        self.conv(f"{tp}.conv1", fmod, "Conv_0")
        self.bn(f"{tp}.bn1", fmod, "BatchNorm_0")
        self.conv(f"{tp}.conv2", fmod, "Conv_1")
        self.bn(f"{tp}.bn2", fmod, "BatchNorm_1")
        if f"{tp}.downsample.0.weight" in self.sd:
            self.conv(f"{tp}.downsample.0", fmod, "Conv_2")
            self.bn(f"{tp}.downsample.1", fmod, "BatchNorm_2")

    def resnet34_layers(self, prefix, fmod):
        k = 0
        for stage, depth in enumerate((3, 4, 6, 3), start=1):
            for j in range(depth):
                self.leaky_block(f"{prefix}layer{stage}.{j}",
                                 (*fmod, f"LeakyBasicBlock_{k}"))
                k += 1

    def out(self) -> dict:
        return {"params": self.params, "batch_stats": self.stats}


def convert_cenet_hardnet_state_dict(state_dict: dict) -> dict:
    """torch CENet(model="HarDNet") state_dict -> flax CENet variables."""
    m = _Mapper(state_dict)
    root = ("CENetHarDNet_0",)
    for i in range(3):  # stem ConvLayers
        m.basic_conv(f"model.base.{i}", (*root, f"BasicConv_{i}"))
    block_idx, trans_idx = (3, 6, 9, 12), (4, 7, 10, 13)
    for s in range(4):
        for j in range(8):  # HarDBlock(n_layers=8)
            m.basic_conv(f"model.base.{block_idx[s]}.layers.{j}",
                         (*root, f"HarDBlock_{s}", f"BasicConv_{j}"))
        m.basic_conv(f"model.base.{trans_idx[s]}",
                     (*root, f"BasicConv_{3 + s}"))
    m.basic_conv("model.conv_1", (*root, "BasicConv_7"))
    m.basic_conv("model.conv_2", (*root, "BasicConv_8"))
    m.conv("model.semantic_output", root, "Conv_0")
    for i in range(3):
        m.conv(f"model.aux_head{i + 1}", root, f"Conv_{i + 1}")
    return m.out()


def convert_cenet_resnet34_state_dict(state_dict: dict) -> dict:
    """torch CENet(model="ResNet_34") state_dict -> flax CENet variables."""
    m = _Mapper(state_dict)
    root = ("CENetResNet34_0",)
    for i, t in enumerate(("conv1", "conv2", "conv3")):
        m.basic_conv(f"model.{t}", (*root, f"BasicConv_{i}"),
                     conv_name="conv", norm_name="bn")
    m.resnet34_layers("model.", root)
    m.basic_conv("model.conv_1", (*root, "BasicConv_3"),
                 conv_name="conv", norm_name="bn")
    m.basic_conv("model.conv_2", (*root, "BasicConv_4"),
                 conv_name="conv", norm_name="bn")
    m.conv("model.semantic_output", root, "Conv_0")
    for i in range(3):
        m.conv(f"model.aux_head{i + 1}", root, f"Conv_{i + 1}")
    return m.out()


def convert_fidnet_state_dict(state_dict: dict) -> dict:
    """torch FIDNet (default ResNet34_aspp_1) state_dict -> flax variables."""
    m = _Mapper(state_dict)
    m.conv("model.backend.conv1", (), "Conv_0")
    m.conv("model.backend.conv2", (), "Conv_1")
    m.bn("model.backend.bn", (), "BatchNorm_0")
    m.resnet34_layers("model.backend.", ())
    for i in range(3):  # ASPP branches, rates 3/6/9
        m.conv(f"model.backend.conv_Aspp_{i + 1}", (), f"Conv_{i + 2}")
        m.bn(f"model.backend.bn{i + 1}", (), f"BatchNorm_{i + 1}")
    m.conv("model.semantic_head.conv_1", (), "Conv_5")
    m.bn("model.semantic_head.bn1", (), "BatchNorm_4")
    m.conv("model.semantic_head.conv_2", (), "Conv_6")
    m.bn("model.semantic_head.bn2", (), "BatchNorm_5")
    m.conv("model.semantic_head.semantic_output", (), "Conv_7")
    return m.out()
