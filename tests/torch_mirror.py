"""Eval-mode torch.nn mirror of the reference MGNet graph, for golden
activation-parity testing of the flax model.

This is a TEST FIXTURE, not product code: a minimal, eval-only
re-statement of the reference architecture's math so we can graft
identical weights into both frameworks and assert activation parity.
Semantics follow (cited per module):

* reference mgnet/modeling/res_net.py:11-110  (BasicStem, BasicBlock)
* reference mgnet/modeling/layers.py:22-322   (decoder, ARM, FFM, GCM,
  MGNetHead, PoseCNN)
* reference mgnet/modeling/mg_net.py:523-829  (three heads, upsample
  orders, activations)

ABN note: the reference trains with InPlaceABNSync; its own export path
(tools/onnx_trt_export.py:19-47) converts every instance to the plain
``ABN`` module = standard BatchNorm + activation. Eval-mode inplace_abn
additionally clamps the scale to |gamma|+eps for invertibility; with the
positive gammas of any real checkpoint the two agree to ~1e-5 relative,
so the mirror (like the reference's exported model and like our flax
ABN) uses standard eval-mode batch_norm + leaky_relu(0.01)/identity.

Every module also exposes ``flax_weights(prefix)`` returning the flat
'path/leaf' numpy dict consumed by mgnet_tpu.utils.weights — the same
key space as tools/convert_torchvision_weights.py — so tests graft the
torch weights into the flax tree through the production import path.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _hwio(w: torch.Tensor) -> np.ndarray:
    """torch OIHW conv kernel -> flax HWIO."""
    return w.detach().numpy().transpose(2, 3, 1, 0)


def _pick(p: torch.Tensor, grad: bool) -> torch.Tensor:
    """The parameter itself, or its gradient (for golden GRADIENT parity:
    the same key space then maps torch grads onto flax grad leaves)."""
    if grad:
        assert p.grad is not None, "call backward() before grad extraction"
        return p.grad
    return p


class EvalABN(nn.Module):
    """Eval-mode ABN: BatchNorm (running stats) + leaky_relu(0.01)/identity.

    Reference semantics: inplace_abn ABN with momentum=0.01, eps=1e-5
    (used at every conv site, e.g. res_net.py:49, layers.py:63).
    Running stats and affine params are registered as buffers/params and
    randomized by tests so stat-mapping bugs cannot hide behind the
    (0, 1) defaults.
    """

    def __init__(self, channels: int, activation: str = "leaky_relu"):
        super().__init__()
        self.bn = nn.BatchNorm2d(channels, eps=1e-5, momentum=0.01)
        self.activation = activation

    def forward(self, x):
        y = self.bn(x)
        if self.activation == "leaky_relu":
            y = F.leaky_relu(y, negative_slope=0.01)
        elif self.activation != "identity":
            raise ValueError(self.activation)
        return y

    def randomize_(self, gen: torch.Generator):
        with torch.no_grad():
            self.bn.weight.copy_(
                0.5 + torch.rand(self.bn.weight.shape, generator=gen))
            self.bn.bias.copy_(
                0.3 * torch.randn(self.bn.bias.shape, generator=gen))
            self.bn.running_mean.copy_(
                0.5 * torch.randn(self.bn.running_mean.shape, generator=gen))
            self.bn.running_var.copy_(
                0.5 + torch.rand(self.bn.running_var.shape, generator=gen))

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        bn = self.bn
        out = {
            f"{prefix}/scale": _pick(bn.weight, grad).detach().numpy(),
            f"{prefix}/bias": _pick(bn.bias, grad).detach().numpy(),
        }
        if not grad:  # running stats are buffers; no gradient leaves
            out[f"{prefix}/mean"] = bn.running_mean.detach().numpy()
            out[f"{prefix}/var"] = bn.running_var.detach().numpy()
        return out


class ConvABN(nn.Module):
    """Bias-free conv + EvalABN (the reference's Conv2d+InPlaceABNSync
    site, e.g. layers.py:55-74). padding = k//2 (torch convention)."""

    def __init__(self, cin: int, cout: int, k: int = 3, stride: int = 1,
                 activation: str = "leaky_relu"):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              bias=False)
        self.abn = EvalABN(cout, activation)

    def forward(self, x):
        return self.abn(self.conv(x))

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = {f"{prefix}/conv/kernel": _hwio(_pick(self.conv.weight, grad))}
        out.update(self.abn.flax_weights(f"{prefix}/abn/BatchNorm_0", grad))
        return out


class Stem(nn.Module):
    """7x7/s2 conv-ABN + 3x3/s2 maxpool (reference res_net.py:82-110)."""

    def __init__(self, cin: int = 3, cout: int = 64):
        super().__init__()
        self.conv1 = ConvABN(cin, cout, k=7, stride=2)

    def forward(self, x):
        return F.max_pool2d(self.conv1(x), kernel_size=3, stride=2, padding=1)

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        return self.conv1.flax_weights(f"{prefix}/conv1", grad)


class BasicBlock(nn.Module):
    """Residual block (reference res_net.py:11-79): conv1 leaky-ABN,
    conv2 identity-ABN, 1x1 identity-ABN projection when channels change,
    then relu(out + shortcut)."""

    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = ConvABN(cin, cout, k=3, stride=stride)
        self.conv2 = ConvABN(cout, cout, k=3, activation="identity")
        self.shortcut = (
            ConvABN(cin, cout, k=1, stride=stride, activation="identity")
            if cin != cout else None
        )

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        s = x if self.shortcut is None else self.shortcut(x)
        return F.relu(y + s)

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = self.conv1.flax_weights(f"{prefix}/conv1", grad)
        out.update(self.conv2.flax_weights(f"{prefix}/conv2", grad))
        if self.shortcut is not None:
            out.update(self.shortcut.flax_weights(f"{prefix}/shortcut", grad))
        return out


class ResNet(nn.Module):
    """R18/R34 trunk: stem + stages res2..res5, strides 4/8/16/32
    (reference res_net.py:113-165; first_stride 1 for res2 else 2)."""

    BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}

    def __init__(self, cin: int = 3, depth: int = 18):
        super().__init__()
        self.stem = Stem(cin, 64)
        self.stages = nn.ModuleList()
        self.stage_names: List[str] = []
        c_in, c_out = 64, 64
        for idx, n in enumerate(self.BLOCKS[depth]):
            blocks = nn.ModuleList()
            for b in range(n):
                stride = (1 if idx == 0 else 2) if b == 0 else 1
                blocks.append(BasicBlock(c_in, c_out, stride))
                c_in = c_out
            self.stages.append(blocks)
            self.stage_names.append(f"res{idx + 2}")
            c_out *= 2

    def forward(self, x) -> Dict[str, torch.Tensor]:
        y = self.stem(x)
        feats = {"stem": y}
        for name, blocks in zip(self.stage_names, self.stages):
            for blk in blocks:
                y = blk(y)
            feats[name] = y
        return feats

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = self.stem.flax_weights(f"{prefix}/stem", grad)
        for name, blocks in zip(self.stage_names, self.stages):
            for b, blk in enumerate(blocks):
                out.update(blk.flax_weights(f"{prefix}/{name}_block{b}", grad))
        return out


class GCM(nn.Module):
    """Global avg pool -> 1x1 conv-ABN -> nearest upsample (broadcast)
    (reference layers.py:187-218)."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = ConvABN(cin, cout, k=1)

    def forward(self, x):
        y = self.conv(x.mean(dim=(2, 3), keepdim=True))
        return y.expand(-1, -1, x.shape[2], x.shape[3])

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        return self.conv.flax_weights(f"{prefix}/conv", grad)


class ARM(nn.Module):
    """3x3 conv-ABN, channel attention via pooled 1x1 identity-ABN +
    sigmoid, multiplied in (reference layers.py:221-267)."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = ConvABN(cin, cout, k=3)
        self.attention_conv = ConvABN(cout, cout, k=1, activation="identity")

    def forward(self, x):
        fm = self.conv(x)
        atten = torch.sigmoid(
            self.attention_conv(fm.mean(dim=(2, 3), keepdim=True)))
        return fm * atten

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = self.conv.flax_weights(f"{prefix}/conv", grad)
        out.update(self.attention_conv.flax_weights(
            f"{prefix}/attention_conv", grad))
        return out


class FFM(nn.Module):
    """concat -> 1x1 conv-ABN -> attention (pool -> 1x1 -> relu -> 1x1 ->
    sigmoid, both bias-free) -> fm + fm*atten (reference layers.py:270-322)."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = ConvABN(cin, cout, k=1)
        self.att1 = nn.Conv2d(cout, cout, 1, bias=False)
        self.att2 = nn.Conv2d(cout, cout, 1, bias=False)

    def forward(self, fsp, fcp):
        fm = self.conv(torch.cat([fsp, fcp], dim=1))
        a = fm.mean(dim=(2, 3), keepdim=True)
        atten = torch.sigmoid(self.att2(F.relu(self.att1(a))))
        return fm + fm * atten

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = self.conv.flax_weights(f"{prefix}/conv", grad)
        out[f"{prefix}/attention_conv1/kernel"] = _hwio(_pick(self.att1.weight, grad))
        out[f"{prefix}/attention_conv2/kernel"] = _hwio(_pick(self.att2.weight, grad))
        return out


class Decoder(nn.Module):
    """BiSeNet-style decoder (reference layers.py:22-94): ARM on res5 and
    res4 with the running context feature added, nearest-upsampled and
    refined; FFM fuses with res3. Returns (fused, [msc32, msc16])."""

    def __init__(self, in_channels=(512, 256, 128), arm=(128, 128),
                 refine=(128, 128), ffm: int = 256):
        super().__init__()
        self.arms = nn.ModuleList(
            [ARM(in_channels[0], arm[0]), ARM(in_channels[1], arm[1])])
        self.refines = nn.ModuleList(
            [ConvABN(arm[0], refine[0], k=3), ConvABN(arm[1], refine[1], k=3)])
        self.ffm = FFM(in_channels[2] + refine[1], ffm)

    def forward(self, features: Dict[str, torch.Tensor]):
        scales = [features["res5"], features["res4"], features["res3"]]
        last = features["global_context"]
        msc = []
        for i in range(2):
            fm = self.arms[i](scales[i]) + last
            msc.append(fm)
            last = F.interpolate(fm, size=scales[i + 1].shape[2:],
                                 mode="nearest")
            last = self.refines[i](last)
        return self.ffm(scales[2], last), msc

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = {}
        for i in range(2):
            out.update(self.arms[i].flax_weights(f"{prefix}/arm{i}", grad))
            out.update(self.refines[i].flax_weights(f"{prefix}/refine{i}", grad))
        out.update(self.ffm.flax_weights(f"{prefix}/ffm", grad))
        return out


class Head(nn.Module):
    """3x3 conv-ABN + bias-free 1x1 predictor (reference layers.py:97-127)."""

    def __init__(self, cin: int, mid: int, cout: int):
        super().__init__()
        self.head = ConvABN(cin, mid, k=3)
        self.predictor = nn.Conv2d(mid, cout, 1, bias=False)

    def forward(self, x):
        return self.predictor(self.head(x))

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = self.head.flax_weights(f"{prefix}/head", grad)
        out[f"{prefix}/predictor/kernel"] = _hwio(_pick(self.predictor.weight, grad))
        return out


def _up8(x, stride: int = 8):
    return F.interpolate(x, scale_factor=stride, mode="bilinear",
                         align_corners=True)


class PoseCNN(nn.Module):
    """Pose net (reference layers.py:130-167): R18 encoder over the
    9-channel frame concat, 4-conv decoder (biased convs), spatial mean,
    scaled by 0.01 into [B, 2, 6]."""

    def __init__(self, num_context: int = 2):
        super().__init__()
        self.encoder = ResNet(cin=3 * (num_context + 1))
        self.conv1 = nn.Conv2d(512, 256, 1)
        self.conv2 = nn.Conv2d(256, 256, 3, padding=1)
        self.conv3 = nn.Conv2d(256, 256, 3, padding=1)
        self.conv4 = nn.Conv2d(256, 6 * num_context, 1)
        self.num_context = num_context

    def forward(self, x):
        y = self.encoder(x)["res5"]
        y = F.relu(self.conv1(y))
        y = F.relu(self.conv2(y))
        y = F.relu(self.conv3(y))
        y = self.conv4(y).mean(dim=(2, 3))
        return 0.01 * y.view(y.shape[0], self.num_context, 6)

    def flax_weights(self, prefix: str, grad: bool = False) -> Dict[str, np.ndarray]:
        out = self.encoder.flax_weights(f"{prefix}/encoder", grad)
        for name in ("conv1", "conv2", "conv3", "conv4"):
            conv = getattr(self, name)
            out[f"{prefix}/{name}/kernel"] = _hwio(_pick(conv.weight, grad))
            out[f"{prefix}/{name}/bias"] = _pick(conv.bias, grad).detach().numpy()
        return out


class MGNetMirror(nn.Module):
    """Full eval-mode MGNet graph (reference mg_net.py:523-829 wiring):
    shared R18 trunk + GCM; per-head decoders; semantic logits upsampled
    x8 bilinear align-corners; center sigmoid'd then upsampled; offset
    upsampled then x8; inverse depth sigmoid/0.5 then upsampled."""

    def __init__(self, num_classes: int = 20, gcm: int = 128,
                 ffm: int = 256, head: int = 256, msc_depth: bool = False):
        super().__init__()
        self.backbone = ResNet()
        self.global_context = GCM(512, gcm)
        self.sem_decoder = Decoder(ffm=ffm)
        self.sem_head = Head(ffm, head, num_classes)
        self.ins_decoder = Decoder(ffm=ffm)
        self.center_head = Head(ffm, head, 1)
        self.offset_head = Head(ffm, head, 2)
        self.depth_decoder = Decoder(ffm=ffm)
        self.depth_head = Head(ffm, head, 1)
        # train-time multi-scale heads over the decoder's msc features
        # (reference mg_net.py:759-768: inputs [ffm s8, msc[1] s16,
        # msc[0] s32], upsample factors 8/16/32)
        self.msc_depth = msc_depth
        if msc_depth:
            self.depth_head1 = Head(128, head, 1)
            self.depth_head2 = Head(128, head, 1)
        self.pose_net = PoseCNN()

    def forward(self, x) -> Dict[str, torch.Tensor]:
        feats = self.backbone(x)
        feats["global_context"] = self.global_context(feats["res5"])

        sem, _ = self.sem_decoder(feats)
        sem = _up8(self.sem_head(sem))

        ins, _ = self.ins_decoder(feats)
        center = _up8(torch.sigmoid(self.center_head(ins)))
        offset = _up8(self.offset_head(ins)) * 8.0

        dec, _ = self.depth_decoder(feats)
        inv_depth = _up8(torch.sigmoid(self.depth_head(dec)) / 0.5)
        depth = 1.0 / torch.clamp(inv_depth, min=1e-6)

        return {"sem_seg": sem, "center": center, "offset": offset,
                "inv_depth": inv_depth, "depth": depth}

    def forward_train(self, x, x_prev, x_next) -> Dict[str, torch.Tensor]:
        """Training-branch forward (reference mg_net.py:250-276): heads on
        the current frame (multi-scale inverse depth when msc_depth), pose
        net on the 9-channel concat. Run under .train() for batch-stat BN
        (the single-device view of InPlaceABNSync)."""
        feats = self.backbone(x)
        feats["global_context"] = self.global_context(feats["res5"])

        sem, _ = self.sem_decoder(feats)
        sem = _up8(self.sem_head(sem))

        ins, _ = self.ins_decoder(feats)
        center = _up8(torch.sigmoid(self.center_head(ins)))
        offset = _up8(self.offset_head(ins)) * 8.0

        dec, msc = self.depth_decoder(feats)
        inv_depths = [_up8(torch.sigmoid(self.depth_head(dec)) / 0.5)]
        if self.msc_depth:
            inv_depths.append(
                _up8(torch.sigmoid(self.depth_head1(msc[1])) / 0.5, 16))
            inv_depths.append(
                _up8(torch.sigmoid(self.depth_head2(msc[0])) / 0.5, 32))

        poses = self.pose_net(torch.cat([x, x_prev, x_next], dim=1))
        return {"sem_seg": sem, "center": center, "offset": offset,
                "inv_depths": inv_depths, "poses": poses}

    def flax_weights(self, grad: bool = False) -> Dict[str, np.ndarray]:
        out = self.backbone.flax_weights("backbone", grad)
        out.update(self.global_context.flax_weights("global_context", grad))
        out.update(self.sem_decoder.flax_weights("sem_seg_head/decoder", grad))
        out.update(self.sem_head.flax_weights("sem_seg_head/head", grad))
        out.update(self.ins_decoder.flax_weights("ins_embed_head/decoder", grad))
        out.update(self.center_head.flax_weights("ins_embed_head/center_head", grad))
        out.update(self.offset_head.flax_weights("ins_embed_head/offset_head", grad))
        out.update(self.depth_decoder.flax_weights("depth_head/decoder", grad))
        out.update(self.depth_head.flax_weights("depth_head/head0", grad))
        if self.msc_depth:
            out.update(self.depth_head1.flax_weights("depth_head/head1", grad))
            out.update(self.depth_head2.flax_weights("depth_head/head2", grad))
        out.update(self.pose_net.flax_weights("pose_net", grad))
        return out


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Randomize all conv weights (scaled for stable activations) and all
    ABN affine/running stats, deterministically."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen)
                               / np.sqrt(fan_in))
                if m.bias is not None:
                    m.bias.copy_(
                        0.1 * torch.randn(m.bias.shape, generator=gen))
            elif isinstance(m, EvalABN):
                m.randomize_(gen)
    model.eval()
