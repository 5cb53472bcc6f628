"""Forward parity of SemanticFPN vs torch oracles of the reference topology.

torchvision is not installed in this image, so the reference model file
cannot be imported directly; instead these tests build pure-torch replicas
of /root/reference/src/baselines/Reichert/semanticFCN_opt.py — resnet18/50,
shufflenet_v2 and regnet_y variants — with reference-identical state_dict
naming, convert their weights with utils.torch_convert, and compare forward
outputs. This validates both the converter mappings and the cross-framework
numerics (BatchNorm/GroupNorm/maxpool/bilinear-resize/attention/channel-
shuffle/squeeze-excite semantics) end to end.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class _Bottleneck(nn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class _Backbone(nn.Module):
    """resnet18 trunk as the reference slices it (conv1 3x3 s1, NO bn in the
    stem, maxpool, layers 1-4)."""

    def __init__(self, in_ch, bottleneck=False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 3, 1, 1, bias=False)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        if bottleneck:  # resnet50 layout
            def stage(cin, width, n, stride):
                blocks = [_Bottleneck(cin, width, stride)]
                blocks += [_Bottleneck(width * 4, width)
                           for _ in range(n - 1)]
                return nn.Sequential(*blocks)
            self.layer1 = stage(64, 64, 3, 1)
            self.layer2 = stage(256, 128, 4, 2)
            self.layer3 = stage(512, 256, 6, 2)
            self.layer4 = stage(1024, 512, 3, 2)
        else:
            def stage(cin, cout, n, stride):
                blocks = [_BasicBlock(cin, cout, stride)]
                blocks += [_BasicBlock(cout, cout) for _ in range(n - 1)]
                return nn.Sequential(*blocks)
            self.layer1 = stage(64, 64, 2, 1)
            self.layer2 = stage(64, 128, 2, 2)
            self.layer3 = stage(128, 256, 2, 2)
            self.layer4 = stage(256, 512, 2, 2)


class _SpatialAttention(nn.Module):
    def __init__(self, cin, reduction=8):
        super().__init__()
        hid = max(1, cin // reduction)
        self.proj = nn.Conv2d(cin, hid, 1, bias=False)
        self.score = nn.Conv2d(hid, 1, 1, bias=False)

    def forward(self, x):
        s = self.score(F.relu(self.proj(x)))
        b, _, h, w = s.shape
        wmap = torch.softmax(s.view(b, 1, h * w), -1).view(b, 1, h, w)
        return x * wmap + x


class _UpsampleBlock(nn.Module):
    def __init__(self, cin, cout, scale, groups=8):
        super().__init__()
        self.scale = scale
        g = math.gcd(groups, cout) or 1
        self.block = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.GroupNorm(g, cout), nn.ReLU(inplace=True))

    def forward(self, x):
        x = F.interpolate(x, scale_factor=self.scale, mode="bilinear",
                          align_corners=False)
        return self.block(x)


def _gn(ch, groups=32):
    g = math.gcd(min(groups, ch), ch) or 1
    return nn.GroupNorm(g, ch)


class TorchReichertOracle(nn.Module):
    """Reference SemanticNetworkWithFPN topology, resnet18, multi-scale
    meta, attention on — state_dict keys match the reference model's."""

    def __init__(self, num_classes, input_channels=2, meta_dim=6,
                 bottleneck=False):
        super().__init__()
        base = [2048, 1024, 512, 256, 128] if bottleneck else \
            [512, 256, 128, 64, 32]
        self.meta_dim = meta_dim
        self.backbone = _Backbone(input_channels + meta_dim, bottleneck)

        def fpn(cin, cout):
            return nn.Sequential(nn.Conv2d(cin, cout, 3, padding=1),
                                 nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

        self.fpn_block4 = fpn(base[0], base[1])
        self.fpn_block3 = fpn(base[1], base[2])
        self.fpn_block2 = fpn(base[2], base[3])
        self.fpn_block1 = fpn(base[3], base[4])
        self.attention4 = _SpatialAttention(base[1])
        self.attention3 = _SpatialAttention(base[2])
        self.attention2 = _SpatialAttention(base[3])
        self.attention1 = _SpatialAttention(base[4])
        self.upsample_layer_x4 = _UpsampleBlock(base[1], base[1] // 8, 8)
        self.upsample_layer_x3 = _UpsampleBlock(base[2], base[2] // 4, 4)
        self.upsample_layer_x2 = _UpsampleBlock(base[3], base[3] // 2, 2)
        cat_ch = base[1] // 8 + base[2] // 4 + base[3] // 2 + base[4]
        self.decoder_semantic = nn.Sequential(
            nn.Conv2d(cat_ch, base[4], 3, padding=1, bias=False),
            _gn(base[4]), nn.ReLU(inplace=True),
            nn.Conv2d(base[4], base[4], 3, padding=1, bias=False),
            _gn(base[4]), nn.ReLU(inplace=True),
            _UpsampleBlock(base[4], base[4] // 2, 2),
            nn.Conv2d(base[4] // 2, num_classes, 1))

    def forward(self, x, meta):
        m1 = F.interpolate(meta, scale_factor=0.5, mode="nearest")
        m2 = F.interpolate(meta, scale_factor=0.25, mode="nearest")
        m3 = F.interpolate(meta, scale_factor=0.125, mode="nearest")
        d = self.meta_dim
        x = torch.cat([x, meta], 1)
        xs = self.backbone.maxpool(F.relu(self.backbone.conv1(x)))
        x1 = self.backbone.layer1(xs)
        x2 = self.backbone.layer2(torch.cat([x1[:, :-d], m1], 1))
        x3 = self.backbone.layer3(torch.cat([x2[:, :-d], m2], 1))
        x4 = self.backbone.layer4(torch.cat([x3[:, :-d], m3], 1))
        x4 = self.attention4(self.fpn_block4(x4))
        x3 = self.attention3(self.fpn_block3(x3))
        x2 = self.attention2(self.fpn_block2(x2))
        x1 = self.attention1(self.fpn_block1(x1))
        x4 = self.upsample_layer_x4(x4)
        x3 = self.upsample_layer_x3(x3)
        x2 = self.upsample_layer_x2(x2)
        fused = torch.cat([x1, x2, x3, x4], 1)
        return self.decoder_semantic(fused)


def _tv_channel_shuffle(x, groups):
    b, c, h, w = x.shape
    x = x.view(b, groups, c // groups, h, w)
    return torch.transpose(x, 1, 2).contiguous().view(b, -1, h, w)


class _TVInvertedResidual(nn.Module):
    """torchvision shufflenetv2.InvertedResidual replica (same child names)."""

    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        bf = oup // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, bf, 1, bias=False),
                nn.BatchNorm2d(bf), nn.ReLU(inplace=True))
        else:
            self.branch1 = nn.Sequential()
        self.branch2 = nn.Sequential(
            nn.Conv2d(inp if stride > 1 else bf, bf, 1, bias=False),
            nn.BatchNorm2d(bf), nn.ReLU(inplace=True),
            nn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
            nn.BatchNorm2d(bf),
            nn.Conv2d(bf, bf, 1, bias=False),
            nn.BatchNorm2d(bf), nn.ReLU(inplace=True))

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return _tv_channel_shuffle(out, 2)


class _TVShuffleBackbone(nn.Module):
    """torchvision shufflenet_v2 as the reference slices it: stride-1 stem
    conv (replaced first layer), stages 2-4, conv5 — no maxpool."""

    def __init__(self, in_ch, stage_channels, conv5_ch=1024, stem=24):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_ch, stem, 3, 1, 1, bias=False),
            nn.BatchNorm2d(stem), nn.ReLU(inplace=True))
        cin = stem
        for name, c, n in zip(("stage2", "stage3", "stage4"),
                              stage_channels, (4, 8, 4)):
            blocks = [_TVInvertedResidual(cin, c, 2)]
            blocks += [_TVInvertedResidual(c, c, 1) for _ in range(n - 1)]
            setattr(self, name, nn.Sequential(*blocks))
            cin = c
        self.conv5 = nn.Sequential(
            nn.Conv2d(cin, conv5_ch, 1, bias=False),
            nn.BatchNorm2d(conv5_ch), nn.ReLU(inplace=True))


class _TVSqueezeExcitation(nn.Module):
    def __init__(self, in_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(in_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, in_ch, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        return x * torch.sigmoid(self.fc2(F.relu(self.fc1(s))))


class _TVYBlock(nn.Module):
    """torchvision regnet ResBottleneckBlock replica (same child names:
    proj.0/.1, f.a/.b/.se/.c)."""

    def __init__(self, w_in, w_out, stride, group_width):
        super().__init__()
        from collections import OrderedDict
        self.proj = None
        if w_in != w_out or stride != 1:
            self.proj = nn.Sequential(
                nn.Conv2d(w_in, w_out, 1, stride, bias=False),
                nn.BatchNorm2d(w_out))
        g = w_out // group_width
        self.f = nn.Sequential(OrderedDict([
            ("a", nn.Sequential(nn.Conv2d(w_in, w_out, 1, bias=False),
                                nn.BatchNorm2d(w_out), nn.ReLU(inplace=True))),
            ("b", nn.Sequential(
                nn.Conv2d(w_out, w_out, 3, stride, 1, groups=g, bias=False),
                nn.BatchNorm2d(w_out), nn.ReLU(inplace=True))),
            ("se", _TVSqueezeExcitation(w_out, int(round(0.25 * w_in)))),
            ("c", nn.Sequential(nn.Conv2d(w_out, w_out, 1, bias=False),
                                nn.BatchNorm2d(w_out))),
        ]))

    def forward(self, x):
        idt = x if self.proj is None else self.proj(x)
        return F.relu(idt + self.f(x))


class _TVRegNetBackbone(nn.Module):
    """torchvision regnet_y as the reference slices it: stride-1 stem,
    trunk_output blocks 1-4 (same 'block{s}.block{s}-{j}' naming)."""

    def __init__(self, in_ch, widths, depths, group_width, stem=32):
        super().__init__()
        from collections import OrderedDict
        self.stem = nn.Sequential(
            nn.Conv2d(in_ch, stem, 3, 1, 1, bias=False),
            nn.BatchNorm2d(stem), nn.ReLU(inplace=True))
        cin = stem
        stages = []
        for s, (w, d) in enumerate(zip(widths, depths), start=1):
            blocks = []
            for j in range(d):
                blocks.append((f"block{s}-{j}", _TVYBlock(
                    cin if j == 0 else w, w, 2 if j == 0 else 1,
                    group_width)))
                cin = w
            stages.append((f"block{s}", nn.Sequential(OrderedDict(blocks))))
        self.trunk_output = nn.Sequential(OrderedDict(stages))


class _TVFusedMBConv(nn.Module):
    """torchvision FusedMBConv replica (expand_ratio=4; same 'block.N.M'
    child naming, stochastic depth = identity at eval)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        mid = cin * 4
        self.use_res = stride == 1 and cin == cout
        self.block = nn.Sequential(
            nn.Sequential(nn.Conv2d(cin, mid, 3, stride, 1, bias=False),
                          nn.BatchNorm2d(mid), nn.SiLU(inplace=True)),
            nn.Sequential(nn.Conv2d(mid, cout, 1, bias=False),
                          nn.BatchNorm2d(cout)))

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class _TVSiLUSqueezeExcitation(nn.Module):
    """torchvision SqueezeExcitation as EfficientNet instantiates it
    (internal activation SiLU, scale activation sigmoid)."""

    def __init__(self, in_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(in_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, in_ch, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        return x * torch.sigmoid(self.fc2(F.silu(self.fc1(s))))


class _TVMBConv(nn.Module):
    """torchvision MBConv replica (expand_ratio=4, SE squeeze = cin // 4)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        mid = cin * 4
        self.use_res = stride == 1 and cin == cout
        self.block = nn.Sequential(
            nn.Sequential(nn.Conv2d(cin, mid, 1, bias=False),
                          nn.BatchNorm2d(mid), nn.SiLU(inplace=True)),
            nn.Sequential(
                nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False),
                nn.BatchNorm2d(mid), nn.SiLU(inplace=True)),
            _TVSiLUSqueezeExcitation(mid, max(1, cin // 4)),
            nn.Sequential(nn.Conv2d(mid, cout, 1, bias=False),
                          nn.BatchNorm2d(cout)))

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class _TVEffNetBackbone(nn.Module):
    """torchvision efficientnet_v2 as the reference slices it: features[0]
    stem (3x3 conv replaced stride-1), features[2..4] used as layers 1-3;
    features[1] exists in checkpoints but is never executed (placeholder
    Identity here) — semanticFCN_opt.py:239-246."""

    def __init__(self, in_ch, stage_channels, stage_sizes, stem=24):
        super().__init__()
        from collections import OrderedDict
        feats = OrderedDict()
        feats["0"] = nn.Sequential(
            nn.Conv2d(in_ch, stem, 3, 1, 1, bias=False),
            nn.BatchNorm2d(stem), nn.SiLU(inplace=True))
        feats["1"] = nn.Identity()
        cin = stem
        kinds = (_TVFusedMBConv, _TVFusedMBConv, _TVMBConv)
        for idx, ch, n, blk in zip(("2", "3", "4"), stage_channels,
                                   stage_sizes, kinds):
            blocks = [blk(cin, ch, 2)]
            blocks += [blk(ch, ch, 1) for _ in range(n - 1)]
            feats[idx] = nn.Sequential(*blocks)
            cin = ch
        self.features = nn.Sequential(feats)


class _TVFire(nn.Module):
    def __init__(self, cin, squeeze, expand):
        super().__init__()
        self.squeeze = nn.Conv2d(cin, squeeze, 1)
        self.expand1x1 = nn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = nn.Conv2d(squeeze, expand, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(s)),
                          F.relu(self.expand3x3(s))], 1)


class _TVSqueezeBackbone(nn.Module):
    """torchvision squeezenet1_0 features with the reference's replaced
    bias-free stride-1 stem conv; maxpools are ceil_mode=True
    (semanticFCN_opt.py:205-215)."""

    def __init__(self, in_ch):
        super().__init__()
        from collections import OrderedDict
        self.features = nn.Sequential(OrderedDict([
            ("0", nn.Conv2d(in_ch, 96, 3, 1, 1, bias=False)),
            ("1", nn.ReLU(inplace=True)),
            ("2", nn.MaxPool2d(3, 2, ceil_mode=True)),
            ("3", _TVFire(96, 16, 64)),
            ("4", _TVFire(128, 16, 64)),
            ("5", _TVFire(128, 32, 128)),
            ("6", nn.MaxPool2d(3, 2, ceil_mode=True)),
            ("7", _TVFire(256, 32, 128)),
            ("8", _TVFire(256, 48, 192)),
            ("9", _TVFire(384, 48, 192)),
            ("10", _TVFire(384, 64, 256)),
            ("11", nn.MaxPool2d(3, 2, ceil_mode=True)),
            ("12", _TVFire(512, 64, 256)),
        ]))


class TorchReichertOracleAny(nn.Module):
    """Reference SemanticNetworkWithFPN topology over a pluggable backbone
    (shufflenet / regnet / efficientnet / squeezenet pyramids;
    semanticFCN_opt.py:238-291, 387-404)."""

    def __init__(self, num_classes, backbone, base, scales, meta_dim=6,
                 mode=None):
        super().__init__()
        self.meta_dim = meta_dim
        self.backbone = backbone
        self.mode = mode or ("shuffle" if isinstance(
            backbone, _TVShuffleBackbone) else "regnet")
        self.shuffle = self.mode == "shuffle"

        def fpn(cin, cout):
            return nn.Sequential(nn.Conv2d(cin, cout, 3, padding=1),
                                 nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

        self.fpn_block4 = fpn(base[0], base[1])
        self.fpn_block3 = fpn(base[1], base[2])
        self.fpn_block2 = fpn(base[2], base[3])
        self.fpn_block1 = fpn(base[3], base[4])
        self.attention4 = _SpatialAttention(base[1])
        self.attention3 = _SpatialAttention(base[2])
        self.attention2 = _SpatialAttention(base[3])
        self.attention1 = _SpatialAttention(base[4])
        out_chs = [base[1] // scales[0], base[2] // scales[1],
                   base[3] // scales[2]]
        self.upsample_layer_x4 = _UpsampleBlock(base[1], out_chs[0], scales[0])
        self.upsample_layer_x3 = _UpsampleBlock(base[2], out_chs[1], scales[1])
        self.upsample_layer_x2 = _UpsampleBlock(base[3], out_chs[2], scales[2])
        cat_ch = sum(out_chs) + base[4]
        self.decoder_semantic = nn.Sequential(
            nn.Conv2d(cat_ch, base[4], 3, padding=1, bias=False),
            _gn(base[4]), nn.ReLU(inplace=True),
            nn.Conv2d(base[4], base[4], 3, padding=1, bias=False),
            _gn(base[4]), nn.ReLU(inplace=True),
            _UpsampleBlock(base[4], base[4] // 2, 2),
            nn.Conv2d(base[4] // 2, num_classes, 1))

    def forward(self, x, meta):
        m1 = F.interpolate(meta, scale_factor=0.5, mode="nearest")
        m2 = F.interpolate(meta, scale_factor=0.25, mode="nearest")
        m3 = F.interpolate(meta, scale_factor=0.125, mode="nearest")
        d = self.meta_dim
        x = torch.cat([x, meta], 1)
        bb = self.backbone
        if self.mode == "shuffle":
            xs = bb.conv1(x)
            x1 = bb.stage2(xs)
            x2 = bb.stage3(torch.cat([x1[:, :-d], m1], 1))
            x3 = bb.stage4(torch.cat([x2[:, :-d], m2], 1))
            x4 = bb.conv5(torch.cat([x3[:, :-d], m3], 1))
        elif self.mode == "effnet":
            # semanticFCN_opt.py:396-404 — x4 = meta-reinjected x3
            f = bb.features
            xs = f[0](x)
            x1 = f[2](xs)
            x2 = f[3](torch.cat([x1[:, :-d], m1], 1))
            x3 = f[4](torch.cat([x2[:, :-d], m2], 1))
            x4 = torch.cat([x3[:, :-d], m3], 1)
        elif self.mode == "squeeze":
            # semanticFCN_opt.py:387-395 — meta before layers 2-3 only
            f = bb.features
            xs = f[3](f[2](F.relu(f[0](x))))
            x1 = f[5](f[4](xs))
            x2 = f[7](f[6](torch.cat([x1[:, :-d], m1], 1)))
            x3 = f[9](f[8](torch.cat([x2[:, :-d], m2], 1)))
            x4 = f[12](f[11](f[10](x3)))
        else:
            xs = bb.stem(x)
            x1 = bb.trunk_output[0](xs)
            x2 = bb.trunk_output[1](torch.cat([x1[:, :-d], m1], 1))
            x3 = bb.trunk_output[2](torch.cat([x2[:, :-d], m2], 1))
            x4 = bb.trunk_output[3](torch.cat([x3[:, :-d], m3], 1))
        x4 = self.attention4(self.fpn_block4(x4))
        x3 = self.attention3(self.fpn_block3(x3))
        x2 = self.attention2(self.fpn_block2(x2))
        x1 = self.attention1(self.fpn_block1(x1))
        x4 = self.upsample_layer_x4(x4)
        x3 = self.upsample_layer_x3(x3)
        x2 = self.upsample_layer_x2(x2)
        fused = torch.cat([x1, x2, x3, x4], 1)
        return self.decoder_semantic(fused)


def test_forward_parity_resnet18_vs_torch_oracle():
    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.utils.torch_convert import (
        apply_converted, convert_reichert_state_dict)

    torch.manual_seed(0)
    oracle = TorchReichertOracle(num_classes=7)
    oracle.eval()
    # randomize BN stats so normalization is actually exercised
    for mod in oracle.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    m = SemanticFPN(num_classes=7, backbone="resnet18", input_channels=2,
                    meta_channels=6)
    key = jax.random.PRNGKey(0)
    h, w = 32, 64
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    meta_np = rng.standard_normal((1, h, w, 6)).astype(np.float32)
    variables = m.init({"params": key, "dropout": key}, jnp.asarray(x_np),
                       jnp.asarray(meta_np), train=False)
    converted = convert_reichert_state_dict(sd, "resnet18", 7)
    variables, missing = apply_converted(variables, converted)
    assert not missing, f"unconverted leaves: {missing[:8]}"

    got = np.asarray(m.apply(variables, jnp.asarray(x_np),
                             jnp.asarray(meta_np), train=False,
                             stochastic=False))
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
            torch.from_numpy(meta_np.transpose(0, 3, 1, 2)),
        ).permute(0, 2, 3, 1).numpy()
    diff = np.abs(got - want)
    assert diff.max() < 5e-3, (
        f"forward mismatch: max {diff.max():.5f} mean {diff.mean():.6f}")


def test_salsanext_forward_parity_vs_reference_code():
    """DIRECT parity vs the actual reference SalsaNext module (torch-only
    imports), with weights carried over by utils.salsanext_convert."""
    import os
    import sys

    ref_dir = "/root/reference/src/baselines/SalsaNext"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not mounted")

    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.models.salsanext import SalsaNext
    from semanticlidarunc_tpu.utils.salsanext_convert import (
        convert_salsanext_state_dict)
    from semanticlidarunc_tpu.utils.torch_convert import apply_converted

    sys.path.insert(0, ref_dir)
    try:
        import importlib
        ref_mod = importlib.import_module("SalsaNext")
    finally:
        sys.path.remove(ref_dir)

    torch.manual_seed(0)
    ref = ref_mod.SalsaNext(nclasses=6, nchannels=5)
    ref.eval()
    for mod in ref.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    m = SalsaNext(num_classes=6)
    key = jax.random.PRNGKey(0)
    h, w = 32, 64
    x_np = np.random.default_rng(3).standard_normal(
        (1, h, w, 5)).astype(np.float32)
    variables = m.init({"params": key, "dropout": key}, jnp.asarray(x_np),
                       train=False)
    converted = convert_salsanext_state_dict(sd)
    variables, missing = apply_converted(variables, converted)
    assert not missing, f"unconverted leaves: {missing[:8]}"

    got = np.asarray(m.apply(variables, jnp.asarray(x_np), train=False,
                             stochastic=False))
    with torch.no_grad():
        want = ref(torch.from_numpy(x_np.transpose(0, 3, 1, 2))
                   ).permute(0, 2, 3, 1).numpy()
    diff = np.abs(got - want)
    assert diff.max() < 5e-3, (
        f"forward mismatch: max {diff.max():.5f} mean {diff.mean():.6f}")


def test_forward_parity_resnet50_vs_torch_oracle():
    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.utils.torch_convert import (
        apply_converted, convert_reichert_state_dict)

    torch.manual_seed(1)
    oracle = TorchReichertOracle(num_classes=5, bottleneck=True)
    oracle.eval()
    for mod in oracle.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    m = SemanticFPN(num_classes=5, backbone="resnet50", input_channels=2,
                    meta_channels=6)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(2)
    x_np = rng.standard_normal((1, 32, 64, 2)).astype(np.float32)
    meta_np = rng.standard_normal((1, 32, 64, 6)).astype(np.float32)
    variables = m.init({"params": key, "dropout": key}, jnp.asarray(x_np),
                       jnp.asarray(meta_np), train=False)
    converted = convert_reichert_state_dict(sd, "resnet50", 5)
    variables, missing = apply_converted(variables, converted)
    assert not missing, f"unconverted leaves: {missing[:8]}"

    got = np.asarray(m.apply(variables, jnp.asarray(x_np),
                             jnp.asarray(meta_np), train=False,
                             stochastic=False))
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
            torch.from_numpy(meta_np.transpose(0, 3, 1, 2)),
        ).permute(0, 2, 3, 1).numpy()
    diff = np.abs(got - want)
    assert diff.max() < 5e-3, (
        f"forward mismatch: max {diff.max():.5f} mean {diff.mean():.6f}")


def _parity_check(oracle, backbone_name, num_classes=7, h=32, w=64,
                  atol=5e-3):
    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.utils.torch_convert import (
        apply_converted, convert_reichert_state_dict)

    oracle.eval()
    for mod in oracle.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    m = SemanticFPN(num_classes=num_classes, backbone=backbone_name,
                    input_channels=2, meta_channels=6)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    meta_np = rng.standard_normal((1, h, w, 6)).astype(np.float32)
    variables = m.init({"params": key, "dropout": key}, jnp.asarray(x_np),
                       jnp.asarray(meta_np), train=False)
    converted = convert_reichert_state_dict(sd, backbone_name, num_classes)
    variables, missing = apply_converted(variables, converted)
    assert not missing, f"unconverted leaves: {missing[:8]}"

    got = np.asarray(m.apply(variables, jnp.asarray(x_np),
                             jnp.asarray(meta_np), train=False,
                             stochastic=False))
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
            torch.from_numpy(meta_np.transpose(0, 3, 1, 2)),
        ).permute(0, 2, 3, 1).numpy()
    diff = np.abs(got - want)
    assert diff.max() < atol, (
        f"{backbone_name} forward mismatch: max {diff.max():.5f} "
        f"mean {diff.mean():.6f}")


def test_forward_parity_shufflenet_vs_torch_oracle():
    torch.manual_seed(1)
    bb = _TVShuffleBackbone(2 + 6, stage_channels=(48, 96, 192),
                            conv5_ch=1024, stem=24)
    oracle = TorchReichertOracleAny(
        7, bb, base=[1024, 192, 96, 48, 24], scales=(4, 4, 2))
    _parity_check(oracle, "shufflenet_v2_x0_5")


def test_forward_parity_regnet_vs_torch_oracle():
    torch.manual_seed(2)
    bb = _TVRegNetBackbone(2 + 6, widths=(48, 104, 208, 440),
                           depths=(1, 3, 6, 6), group_width=8, stem=32)
    oracle = TorchReichertOracleAny(
        7, bb, base=[440, 208, 104, 48, 32], scales=(8, 4, 2))
    _parity_check(oracle, "regnet_y_400mf")


def test_forward_parity_efficientnet_v2_s_vs_torch_oracle():
    torch.manual_seed(3)
    bb = _TVEffNetBackbone(2 + 6, stage_channels=(48, 64, 128),
                           stage_sizes=(4, 4, 6), stem=24)
    oracle = TorchReichertOracleAny(
        7, bb, base=[128, 128, 64, 48, 168], scales=(4, 4, 2), mode="effnet")
    _parity_check(oracle, "efficientnet_v2_s")


def test_forward_parity_squeezenet_vs_torch_oracle():
    torch.manual_seed(4)
    bb = _TVSqueezeBackbone(2 + 6)
    oracle = TorchReichertOracleAny(
        7, bb, base=[512, 384, 256, 256, 112], scales=(4, 2, 2),
        mode="squeeze")
    _parity_check(oracle, "squeezenet1_0")


def _import_reference_module(subdir, module):
    """Import a torch-only reference baseline module as a parity oracle."""
    import importlib
    import os
    import sys

    ref_dir = f"/root/reference/src/baselines/{subdir}"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, ref_dir)
    try:
        return importlib.import_module(module)
    finally:
        sys.path.remove(ref_dir)


def _randomize_bn_stats(ref):
    for mod in ref.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)


def _assert_baseline_parity(ref, flax_model, convert_fn, n_outputs):
    """Random-init reference module (eval, randomized BN stats) vs the flax
    model through the converter, on a (1,32,64,5) input."""
    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.utils.torch_convert import apply_converted

    ref.eval()
    _randomize_bn_stats(ref)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    key = jax.random.PRNGKey(0)
    x_np = np.random.default_rng(7).standard_normal(
        (1, 32, 64, 5)).astype(np.float32)
    variables = flax_model.init({"params": key, "dropout": key},
                                jnp.asarray(x_np), train=False)
    variables, missing = apply_converted(variables, convert_fn(sd))
    assert not missing, f"unconverted leaves: {missing[:8]}"

    got = flax_model.apply(variables, jnp.asarray(x_np), train=False,
                           stochastic=False)
    got = [np.asarray(g) for g in (got if isinstance(got, (list, tuple))
                                   else [got])]
    with torch.no_grad():
        want = ref(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    want = [w.permute(0, 2, 3, 1).numpy()
            for w in (want if isinstance(want, (list, tuple)) else [want])]
    assert len(got) == len(want) == n_outputs
    for i, (g, w) in enumerate(zip(got, want)):
        diff = np.abs(g - w)
        assert diff.max() < 5e-3, (
            f"output {i} mismatch: max {diff.max():.5f} "
            f"mean {diff.mean():.6f}")


def test_cenet_hardnet_forward_parity_vs_reference_code():
    """DIRECT parity vs the actual reference CENet HarDNet (CENet.py:7-26,
    CENet_HardDNet.py), weights via utils.baseline_convert."""
    from semanticlidarunc_tpu.models.cenet import CENet
    from semanticlidarunc_tpu.utils.baseline_convert import (
        convert_cenet_hardnet_state_dict)

    ref_mod = _import_reference_module("CENet", "CENet")
    torch.manual_seed(0)
    ref = ref_mod.CENet(6, aux=True, model="HarDNet")
    _assert_baseline_parity(ref, CENet(6, aux=True, model="HarDNet"),
                            convert_cenet_hardnet_state_dict, n_outputs=4)


def test_cenet_resnet34_forward_parity_vs_reference_code():
    """DIRECT parity vs the actual reference CENet ResNet_34
    (CENet_ResNet34.py:91-196), weights via utils.baseline_convert."""
    from semanticlidarunc_tpu.models.cenet import CENet
    from semanticlidarunc_tpu.utils.baseline_convert import (
        convert_cenet_resnet34_state_dict)

    ref_mod = _import_reference_module("CENet", "CENet")
    torch.manual_seed(1)
    ref = ref_mod.CENet(6, aux=True, model="ResNet_34")
    _assert_baseline_parity(ref, CENet(6, aux=True, model="ResNet_34"),
                            convert_cenet_resnet34_state_dict, n_outputs=4)


def test_fidnet_forward_parity_vs_reference_code():
    """DIRECT parity vs the actual reference FIDNet (default ResNet34_aspp_1
    variant, FIDNet.py:21-41), weights via utils.baseline_convert."""
    from semanticlidarunc_tpu.models.fidnet import FIDNet
    from semanticlidarunc_tpu.utils.baseline_convert import (
        convert_fidnet_state_dict)

    ref_mod = _import_reference_module("FIDNet", "FIDNet")
    torch.manual_seed(2)
    ref = ref_mod.FIDNet(6)
    _assert_baseline_parity(ref, FIDNet(6), convert_fidnet_state_dict,
                            n_outputs=1)


def test_convert_checkpoint_cli_baseline_roundtrip(tmp_path):
    """The converter CLI handles --baseline CENet end to end: torch ckpt ->
    orbax dir -> restored variables run the flax forward."""
    import jax.numpy as jnp

    from semanticlidarunc_tpu.cli import convert_checkpoint as cc
    from semanticlidarunc_tpu.models.cenet import CENet
    from semanticlidarunc_tpu.train import checkpoint as ckpt

    ref_mod = _import_reference_module("CENet", "CENet")
    torch.manual_seed(3)
    ref = ref_mod.CENet(6, aux=True, model="HarDNet")
    pt = tmp_path / "model_final.pt"
    torch.save(ref.state_dict(), pt)

    out = tmp_path / "converted"
    cc.main(cc.parse_args([
        "--torch_ckpt", str(pt), "--baseline", "CENet",
        "--model_type", "HarDNet", "--num_classes", "6",
        "--out", str(out)]))

    restored = ckpt.restore_checkpoint(str(out))
    variables = restored["variables"]
    m = CENet(6, aux=True, model="HarDNet")
    outs = m.apply(variables, jnp.zeros((1, 32, 64, 5)), train=False,
                   stochastic=False)
    assert len(outs) == 4 and outs[0].shape == (1, 32, 64, 6)
    # CENet emits softmax probs (reference CENet_HardDNet.py:318)
    np.testing.assert_allclose(np.asarray(outs[0]).sum(-1), 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# MC-dropout parity vs the reference's actual mc_forward pipeline
# (/root/reference/src/utils/mc_dropout.py:55-133), matched dropout masks
# ---------------------------------------------------------------------------

class _StreamDropout2d(nn.Dropout2d):
    """Dropout2d that consumes a fixed stream of channel masks (pre-scaled by
    1/(1-p)) — but only in train mode, so the reference's dropout_sampling /
    set_dropout_mode machinery (mc_dropout.py:13-34) is exercised for real:
    isinstance(nn.Dropout2d) -> flipped to train for sampling, restored
    after."""

    def __init__(self, p, masks):
        super().__init__(p)
        self._masks = [torch.from_numpy(m) for m in masks]
        self._i = 0

    def forward(self, x):
        if not self.training:
            return x
        m = self._masks[self._i % len(self._masks)]
        self._i += 1
        return x * m

    def reset(self):
        self._i = 0


class _McReichertOracle(TorchReichertOracle):
    """TorchReichertOracle + the reference's pyramid Dropout2d(0.1) — the one
    and only dropout in the Reichert net (semanticFCN_opt.py:266,450) and
    therefore the entire MC-dropout noise source."""

    def __init__(self, num_classes, masks):
        super().__init__(num_classes)
        self.dropout = _StreamDropout2d(0.1, masks)

    def forward(self, x, meta):
        m1 = F.interpolate(meta, scale_factor=0.5, mode="nearest")
        m2 = F.interpolate(meta, scale_factor=0.25, mode="nearest")
        m3 = F.interpolate(meta, scale_factor=0.125, mode="nearest")
        d = self.meta_dim
        x = torch.cat([x, meta], 1)
        xs = self.backbone.maxpool(F.relu(self.backbone.conv1(x)))
        x1 = self.backbone.layer1(xs)
        x2 = self.backbone.layer2(torch.cat([x1[:, :-d], m1], 1))
        x3 = self.backbone.layer3(torch.cat([x2[:, :-d], m2], 1))
        x4 = self.backbone.layer4(torch.cat([x3[:, :-d], m3], 1))
        x4 = self.attention4(self.fpn_block4(x4))
        x3 = self.attention3(self.fpn_block3(x3))
        x2 = self.attention2(self.fpn_block2(x2))
        x1 = self.attention1(self.fpn_block1(x1))
        x4 = self.upsample_layer_x4(x4)
        x3 = self.upsample_layer_x3(x3)
        x2 = self.upsample_layer_x2(x2)
        fused = self.dropout(torch.cat([x1, x2, x3, x4], 1))
        return self.decoder_semantic(fused)


def _import_reference_mc_dropout():
    import importlib
    import os
    import sys

    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, ref_src)
    try:
        return importlib.import_module("utils.mc_dropout")
    finally:
        sys.path.remove(ref_src)


def test_mc_dropout_parity_vs_reference_mc_forward():
    """The driver's headline config is MC-dropout eval; this leg proves the
    T-sample pipeline end to end against the reference's ACTUAL
    `mc_forward` / `mc_dropout_probs` / `predictive_entropy_mc`
    (mc_dropout.py:55-133) on converted weights with IDENTICAL per-sample
    dropout masks: per-sample logits, p-bar, normalized H, and MI all match.
    """
    import jax
    import jax.numpy as jnp

    from semanticlidarunc_tpu.models.fpn import SemanticFPN
    from semanticlidarunc_tpu.prob.mc_dropout import mc_summaries
    from semanticlidarunc_tpu.utils.torch_convert import (
        apply_converted, convert_reichert_state_dict)

    ref_mc = _import_reference_mc_dropout()

    t_samples, nc, h, w = 6, 7, 32, 64
    cat_ch = 256 // 8 + 128 // 4 + 64 // 2 + 32  # fused pyramid channels
    rng = np.random.default_rng(11)
    p_drop = 0.1
    masks = (rng.random((t_samples, 1, cat_ch, 1, 1)) >= p_drop
             ).astype(np.float32) / (1.0 - p_drop)

    torch.manual_seed(4)
    oracle = _McReichertOracle(nc, masks=list(masks))
    oracle.eval()
    for mod in oracle.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()
          if not k.startswith("dropout.")}

    x_np = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    meta_np = rng.standard_normal((1, h, w, 6)).astype(np.float32)

    m = SemanticFPN(num_classes=nc, backbone="resnet18", input_channels=2,
                    meta_channels=6)
    key = jax.random.PRNGKey(0)
    variables = m.init({"params": key, "dropout": key}, jnp.asarray(x_np),
                       jnp.asarray(meta_np), train=False)
    converted = convert_reichert_state_dict(sd, "resnet18", nc)
    variables, missing = apply_converted(variables, converted)
    assert not missing, f"unconverted leaves: {missing[:8]}"

    # --- reference pipeline: T stochastic forwards -> logits stack --------
    inputs = [torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
              torch.from_numpy(meta_np.transpose(0, 3, 1, 2))]
    ref_logits = ref_mc.mc_forward(oracle, inputs, T=t_samples)
    assert not oracle.dropout.training, "dropout_sampling must restore eval"
    ref_logits = ref_logits.permute(0, 1, 3, 4, 2).numpy()  # [T,B,H,W,C]

    # --- JAX pipeline: trunk once, head per matched mask ------------------
    fused = m.apply(variables, jnp.asarray(x_np), jnp.asarray(meta_np),
                    train=False, method=SemanticFPN.features)
    got_stack = np.stack([
        np.asarray(m.apply(variables,
                           fused * jnp.asarray(mk.reshape(1, 1, 1, cat_ch)),
                           stochastic=False, method=SemanticFPN.head))
        for mk in masks[:, 0, :, 0, 0]], axis=0)

    diff = np.abs(got_stack - ref_logits)
    assert diff.max() < 5e-3, (
        f"per-sample MC logits mismatch: max {diff.max():.5f}")

    # --- summaries: p_bar / H_norm / MI_norm ------------------------------
    oracle.dropout.reset()
    ref_probs = ref_mc.mc_dropout_probs(oracle, inputs, T=t_samples)
    ref_h_norm = ref_mc.predictive_entropy_mc(
        ref_probs, normalize=True).numpy()           # [B,H,W]
    ref_probs = ref_probs.permute(0, 1, 3, 4, 2).numpy()
    ref_p_bar = ref_probs.mean(axis=0)
    # MI from the reference's own sample stack (trainer.py:1143-1152 math)
    ent = lambda p: -(np.clip(p, 1e-12, None)
                      * np.log(np.clip(p, 1e-12, None))).sum(-1)
    ref_mi_norm = (ent(ref_p_bar)
                   - ent(ref_probs).mean(axis=0)) / np.log(nc)

    p_bar, h_norm, mi_norm = (np.asarray(v) for v in
                              mc_summaries(jnp.asarray(got_stack)))
    assert np.abs(p_bar - ref_p_bar).max() < 1e-3
    assert np.abs(h_norm - ref_h_norm).max() < 1e-3
    assert np.abs(mi_norm - ref_mi_norm).max() < 1e-3
