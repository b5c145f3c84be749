"""Torch runtime for exported YOLOX weights -> TorchScript artifact.

The reference ships a TorchScript export (reference
tools/export_torchscript.py:16, PL `to_torchscript`); this module is the
equivalent for the TPU framework: build a torch.nn Module from the
export_npz weight record (BN folded, NCHW, OIHW weights — same math as
deploy/numpy_infer.py), trace it, and `torch.jit.save` a .pt any libtorch
runtime loads. Verified against the jax eval forward by
tests/test_torchscript_export.py and tools/export_torchscript.py --verify.

torch stays an OPTIONAL dependency of the deploy toolchain only — nothing
in the training/eval path imports it.
"""

from __future__ import annotations

import numpy as np

from .numpy_infer import fuse_conv_bn, repconv_kernel_bias


def _t(torch, arr):
    return torch.from_numpy(np.ascontiguousarray(arr, np.float32))


def _conv_params(p, s):
    """ConvBlock subtree -> (OIHW weight, bias) with BN folded."""
    kernel = p["conv"]["kernel"]
    bias = p["conv"].get("bias")
    if "bn" in p:
        kernel, bias = fuse_conv_bn(kernel, p["bn"]["scale"], p["bn"]["bias"],
                                    s["bn"]["mean"], s["bn"]["var"])
    if bias is None:
        bias = np.zeros(kernel.shape[-1], np.float32)
    return kernel.transpose(3, 2, 0, 1), bias


def build_torch_model(params, stats, meta):
    """Returns a torch.nn.Module: images [B,3,S,S] (0-255 float32 NCHW) ->
    decoded predictions [B, A, 5+C] (xyxy + sigmoid scores)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class ConvBlock(nn.Module):
        def __init__(self, p, s, stride=1, groups=1, act=True):
            super().__init__()
            w, b = _conv_params(p, s)
            o, i_g, kh, kw = w.shape
            self.conv = nn.Conv2d(i_g * groups, o, (kh, kw), stride=stride,
                                  padding=(kh - 1) // 2, groups=groups)
            with torch.no_grad():
                self.conv.weight.copy_(_t(torch, w))
                self.conv.bias.copy_(_t(torch, b))
            self.act = act

        def forward(self, x):
            y = self.conv(x)
            return F.silu(y) if self.act else y

    def sub(p, s, name):
        return p[name], s.get(name, {})

    class DWConv(nn.Module):
        def __init__(self, p, s, stride=1):
            super().__init__()
            pd, sd = sub(p, s, "dconv")
            ch = pd["conv"]["kernel"].shape[-1]
            self.d = ConvBlock(pd, sd, stride=stride, groups=ch)
            self.p = ConvBlock(*sub(p, s, "pconv"))

        def forward(self, x):
            return self.p(self.d(x))

    def dw_or_conv(p, s, name, stride, depthwise):
        if depthwise:
            return DWConv(*sub(p, s, name), stride=stride)
        return ConvBlock(*sub(p, s, name), stride=stride)

    class Bottleneck(nn.Module):
        def __init__(self, p, s, shortcut, depthwise):
            super().__init__()
            self.c1 = ConvBlock(*sub(p, s, "conv1"))
            self.c2 = dw_or_conv(p, s, "conv2", 1, depthwise)
            cin = p["conv1"]["conv"]["kernel"].shape[2]
            cout = (p["conv2"]["pconv"] if depthwise
                    else p["conv2"])["conv"]["kernel"].shape[-1]
            self.add = shortcut and cin == cout

        def forward(self, x):
            y = self.c2(self.c1(x))
            return x + y if self.add else y

    class CSP(nn.Module):
        def __init__(self, p, s, n, shortcut, depthwise):
            super().__init__()
            self.c1 = ConvBlock(*sub(p, s, "conv1"))
            self.c2 = ConvBlock(*sub(p, s, "conv2"))
            self.m = nn.Sequential(*[
                Bottleneck(*sub(p, s, f"m{i}"), shortcut, depthwise)
                for i in range(n)])
            self.c3 = ConvBlock(*sub(p, s, "conv3"))

        def forward(self, x):
            return self.c3(torch.cat([self.m(self.c1(x)), self.c2(x)], 1))

    class SPP(nn.Module):
        def __init__(self, p, s, ks=(5, 9, 13)):
            super().__init__()
            self.c1 = ConvBlock(*sub(p, s, "conv1"))
            self.ks = ks
            self.c2 = ConvBlock(*sub(p, s, "conv2"))

        def forward(self, x):
            x = self.c1(x)
            pools = [F.max_pool2d(x, k, stride=1, padding=k // 2)
                     for k in self.ks]
            return self.c2(torch.cat([x] + pools, 1))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            pb, sb = params["backbone"], stats.get("backbone", {})
            depths = meta["backbone_depths"]
            dw = meta.get("backbone_depthwise", False)
            self.stem = ConvBlock(*sub(pb["stem"], sb["stem"], "conv"))
            self.downs = nn.ModuleList(
                [dw_or_conv(pb, sb, f"stage{i + 1}_down", 2, dw)
                 for i in range(4)])
            self.spp = SPP(*sub(pb, sb, "stage4_spp"))
            self.csps = nn.ModuleList(
                [CSP(*sub(pb, sb, f"stage{i + 1}_csp"), depths[i],
                     i != 3, dw) for i in range(4)])
            # name-keyed like onnx_export.py's feats dict: supports 'stem'
            # as an output and fails with a clear KeyError on anything else
            self.out_keys = list(meta["backbone_outputs"])

            pn, sn = params["neck"], stats.get("neck", {})
            nd = meta["neck_depths"][0]
            dwn = meta.get("neck_depthwise", False)
            self.shrink1 = ConvBlock(*sub(pn, sn, "shrink_conv1"))
            self.p5p4 = CSP(*sub(pn, sn, "p5_p4"), nd, False, dwn)
            self.shrink2 = ConvBlock(*sub(pn, sn, "shrink_conv2"))
            self.p4p3 = CSP(*sub(pn, sn, "p4_p3"), nd, False, dwn)
            self.down1 = dw_or_conv(pn, sn, "downsample_conv1", 2, dwn)
            self.n3n4 = CSP(*sub(pn, sn, "n3_n4"), nd, False, dwn)
            self.down2 = dw_or_conv(pn, sn, "downsample_conv2", 2, dwn)
            self.n4n5 = CSP(*sub(pn, sn, "n4_n5"), nd, False, dwn)

            ph, sh = params["head"], stats.get("head", {})
            dwh = meta.get("head_depthwise", False)
            self.stems = nn.ModuleList()
            self.cls = nn.ModuleList()
            self.reg = nn.ModuleList()
            self.preds = nn.ModuleList()
            for k in range(3):
                self.stems.append(ConvBlock(*sub(ph, sh, f"stem{k}")))
                self.cls.append(nn.Sequential(
                    dw_or_conv(ph, sh, f"cls_conv{k}_0", 1, dwh),
                    dw_or_conv(ph, sh, f"cls_conv{k}_1", 1, dwh)))
                self.reg.append(nn.Sequential(
                    dw_or_conv(ph, sh, f"reg_conv{k}_0", 1, dwh),
                    dw_or_conv(ph, sh, f"reg_conv{k}_1", 1, dwh)))
                mods = {}
                for nm in ("cls_pred", "reg_pred", "obj_pred"):
                    w = ph[f"{nm}{k}"]["kernel"].transpose(3, 2, 0, 1)
                    conv = nn.Conv2d(w.shape[1], w.shape[0], 1)
                    with torch.no_grad():
                        conv.weight.copy_(_t(torch, w))
                        conv.bias.copy_(_t(torch, ph[f"{nm}{k}"]["bias"]))
                    mods[nm] = conv
                self.preds.append(nn.ModuleDict(mods))
            self.strides = [float(s) for s in meta["strides"]]

        def forward(self, x):
            # column-parity-major s2d (layers/blocks.py:203 order)
            b, c, h, w = x.shape
            x = x.reshape(b, c, h // 2, 2, w // 2, 2)
            x = x.permute(0, 5, 3, 1, 2, 4).reshape(b, 4 * c, h // 2, w // 2)
            x = self.stem(x)
            feats = {"stem": x}
            for i in range(4):
                x = self.downs[i](x)
                if i == 3:
                    x = self.spp(x)
                x = self.csps[i](x)
                feats[f"stage{i + 1}"] = x
            c3, c4, c5 = [feats[k] for k in self.out_keys]

            p5e = self.shrink1(c5)
            p4 = self.p5p4(torch.cat(
                [F.interpolate(p5e, scale_factor=2.0), c4], 1))
            p4e = self.shrink2(p4)
            p3 = self.p4p3(torch.cat(
                [F.interpolate(p4e, scale_factor=2.0), c3], 1))
            n4 = self.n3n4(torch.cat([self.down1(p3), p4e], 1))
            n5 = self.n4n5(torch.cat([self.down2(n4), p5e], 1))

            preds = []
            for k, feat in enumerate([p3, n4, n5]):
                xk = self.stems[k](feat)
                cls_out = self.preds[k]["cls_pred"](self.cls[k](xk))
                rf = self.reg[k](xk)
                reg_out = self.preds[k]["reg_pred"](rf)
                obj_out = self.preds[k]["obj_pred"](rf)
                lvl = torch.cat([reg_out, obj_out, cls_out], 1)
                bk, ck, hk, wk = lvl.shape
                flat = lvl.reshape(bk, ck, hk * wk).permute(0, 2, 1)
                gy, gx = torch.meshgrid(
                    torch.arange(hk, dtype=torch.float32),
                    torch.arange(wk, dtype=torch.float32), indexing="ij")
                grid = torch.stack(
                    [gx.reshape(-1), gy.reshape(-1)], -1).unsqueeze(0)
                stride = self.strides[k]
                xy = (flat[..., :2] + grid) * stride
                wh = torch.exp(flat[..., 2:4]) * stride
                preds.append(torch.cat([xy, wh, flat[..., 4:]], -1))
            p = torch.cat(preds, 1)
            boxes = torch.cat([p[..., :2] - p[..., 2:4] / 2,
                               p[..., :2] + p[..., 2:4] / 2], -1)
            return torch.cat([boxes, torch.sigmoid(p[..., 4:])], -1)

    # ------------------------------------------- yolov7 family (anchor)

    class ELAN(nn.Module):
        def __init__(self, p, s, num_bottle):
            super().__init__()
            n = num_bottle // 2 if num_bottle > 2 else 1
            self.c1 = ConvBlock(*sub(p, s, "conv1"))
            self.c2 = ConvBlock(*sub(p, s, "conv2"))
            self.b3 = nn.Sequential(*[ConvBlock(*sub(p, s, f"conv3_{i}"))
                                      for i in range(n)])
            self.b4 = nn.Sequential(*[ConvBlock(*sub(p, s, f"conv4_{i}"))
                                      for i in range(n)])
            self.c5 = ConvBlock(*sub(p, s, "conv5"))

        def forward(self, x):
            x1, x2 = self.c1(x), self.c2(x)
            x3 = self.b3(x2)
            x4 = self.b4(x3)
            return self.c5(torch.cat([x1, x2, x3, x4], 1))

    class Transition(nn.Module):
        def __init__(self, p, s):
            super().__init__()
            self.c1 = ConvBlock(*sub(p, s, "conv1"))
            self.c2 = ConvBlock(*sub(p, s, "conv2"))
            self.c3 = ConvBlock(*sub(p, s, "conv3"), stride=2)

        def forward(self, x):
            x1 = self.c1(F.max_pool2d(x, 2, stride=2))
            x2 = self.c3(self.c2(x))
            return torch.cat([x2, x1], 1)

    class SPPCSPC(nn.Module):
        def __init__(self, p, s, ks=(5, 9, 13)):
            super().__init__()
            self.cv1 = ConvBlock(*sub(p, s, "cv1"))
            self.cv3 = ConvBlock(*sub(p, s, "cv3"))
            self.cv4 = ConvBlock(*sub(p, s, "cv4"))
            self.ks = ks
            self.cv5 = ConvBlock(*sub(p, s, "cv5"))
            self.cv6 = ConvBlock(*sub(p, s, "cv6"))
            self.cv2 = ConvBlock(*sub(p, s, "cv2"))
            self.cv7 = ConvBlock(*sub(p, s, "cv7"))

        def forward(self, x):
            x1 = self.cv4(self.cv3(self.cv1(x)))
            pools = [F.max_pool2d(x1, k, stride=1, padding=k // 2)
                     for k in self.ks]
            y1 = self.cv6(self.cv5(torch.cat([x1] + pools, 1)))
            return self.cv7(torch.cat([y1, self.cv2(x)], 1))

    class V7CSP(nn.Module):
        def __init__(self, p, s, num_bottle):
            super().__init__()
            self.c1 = ConvBlock(*sub(p, s, "conv1"))
            self.c2 = ConvBlock(*sub(p, s, "conv2"))
            self.c3 = ConvBlock(*sub(p, s, "conv3"))
            self.chain = nn.ModuleList(
                [ConvBlock(*sub(p, s, f"conv4_{i}"))
                 for i in range(num_bottle)])
            self.c5 = ConvBlock(*sub(p, s, "conv5"))

        def forward(self, x):
            x1, x2 = self.c1(x), self.c2(x)
            x3 = self.c3(x2)
            parts = [x1, x2, x3]
            for m in self.chain:
                x3 = m(x3)
                parts.append(x3)
            return self.c5(torch.cat(parts, 1))

    def v7_out_conv(p, s, name):
        pn, sn = sub(p, s, name)
        if "rbr_dense_conv" not in pn:
            return ConvBlock(pn, sn)
        kernel, bias = repconv_kernel_bias(pn, sn)
        w = np.asarray(kernel).transpose(3, 2, 0, 1)
        conv = nn.Conv2d(w.shape[1], w.shape[0], 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(_t(torch, w))
            conv.bias.copy_(_t(torch, np.asarray(bias)))
        return nn.Sequential(conv, nn.SiLU())

    class V7Model(nn.Module):
        def __init__(self):
            super().__init__()
            pb, sb = params["backbone"], stats.get("backbone", {})
            depths = meta["backbone_depths"]
            self.stem = nn.Sequential(
                ConvBlock(*sub(pb, sb, "stem0")),
                ConvBlock(*sub(pb, sb, "stem1"), stride=2),
                ConvBlock(*sub(pb, sb, "stem2")))
            self.stage1_down = ConvBlock(*sub(pb, sb, "stage1_down"),
                                         stride=2)
            self.stage1_elan = ELAN(*sub(pb, sb, "stage1_elan"), depths[0])
            self.trans = nn.ModuleList(
                [Transition(*sub(pb, sb, f"stage{i}_trans"))
                 for i in (2, 3, 4)])
            self.elans = nn.ModuleList(
                [ELAN(*sub(pb, sb, f"stage{i}_elan"), depths[i - 1])
                 for i in (2, 3, 4)])
            self.spp = SPP(*sub(pb, sb, "stage4_spp"))
            self.out_keys = list(meta["backbone_outputs"])

            pn, sn = params["neck"], stats.get("neck", {})
            nd = meta["neck_depths"][0]
            self.nspp = SPPCSPC(*sub(pn, sn, "spp"))
            self.conv_p5 = ConvBlock(*sub(pn, sn, "conv_for_P5"))
            self.conv_c4 = ConvBlock(*sub(pn, sn, "conv_for_C4"))
            self.p5p4 = V7CSP(*sub(pn, sn, "p5_p4"), nd)
            self.conv_p4 = ConvBlock(*sub(pn, sn, "conv_for_P4"))
            self.conv_c3 = ConvBlock(*sub(pn, sn, "conv_for_C3"))
            self.p4p3 = V7CSP(*sub(pn, sn, "p4_p3"), nd)
            self.down1 = Transition(*sub(pn, sn, "downsample_conv1"))
            self.n3n4 = V7CSP(*sub(pn, sn, "n3_n4"), nd)
            self.down2 = Transition(*sub(pn, sn, "downsample_conv2"))
            self.n4n5 = V7CSP(*sub(pn, sn, "n4_n5"), nd)
            self.outs = nn.ModuleList(
                [v7_out_conv(pn, sn, f"n{k}_out") for k in (3, 4, 5)])

            ph = params["head"]
            self.convs = nn.ModuleList()
            for k in range(3):
                self.register_buffer(
                    f"ia{k}", _t(torch, np.asarray(
                        ph[f"ia{k}"]).transpose(0, 3, 1, 2)))
                self.register_buffer(
                    f"im{k}", _t(torch, np.asarray(
                        ph[f"im{k}"]).transpose(0, 3, 1, 2)))
                w = ph[f"conv{k}"]["kernel"].transpose(3, 2, 0, 1)
                conv = nn.Conv2d(w.shape[1], w.shape[0], 1)
                with torch.no_grad():
                    conv.weight.copy_(_t(torch, w))
                    conv.bias.copy_(_t(torch, ph[f"conv{k}"]["bias"]))
                self.convs.append(conv)
            self.strides = [float(s) for s in meta["strides"]]
            self.na = int(meta.get("num_anchor", 3))
            for k, lvl in enumerate(meta["anchors"]):
                self.register_buffer(
                    f"anc{k}", torch.tensor(lvl, dtype=torch.float32))

        def forward(self, x):
            x = self.stem(x)
            feats = {"stem": x}
            x = self.stage1_elan(self.stage1_down(x))
            feats["stage1"] = x
            for i in range(3):
                x = self.trans[i](x)
                if i == 2:
                    x = self.spp(x)
                x = self.elans[i](x)
                feats[f"stage{i + 2}"] = x
            c3, c4, c5 = [feats[k] for k in self.out_keys]

            p5 = self.nspp(c5)
            p4 = self.p5p4(torch.cat(
                [F.interpolate(self.conv_p5(p5), scale_factor=2.0),
                 self.conv_c4(c4)], 1))
            p3 = self.p4p3(torch.cat(
                [F.interpolate(self.conv_p4(p4), scale_factor=2.0),
                 self.conv_c3(c3)], 1))
            n4 = self.n3n4(torch.cat([self.down1(p3), p4], 1))
            n5 = self.n4n5(torch.cat([self.down2(n4), p5], 1))
            levels = [self.outs[0](p3), self.outs[1](n4), self.outs[2](n5)]

            preds = []
            for k, feat in enumerate(levels):
                lvl = self.convs[k](feat + getattr(self, f"ia{k}")) \
                    * getattr(self, f"im{k}")
                bk, ck, hk, wk = lvl.shape
                na, hw = self.na, hk * wk
                flat = lvl.reshape(bk, na, ck // na, hw) \
                    .permute(0, 1, 3, 2).reshape(bk, na * hw, ck // na)
                flat = torch.sigmoid(flat)
                gy, gx = torch.meshgrid(
                    torch.arange(hk, dtype=torch.float32),
                    torch.arange(wk, dtype=torch.float32), indexing="ij")
                cell = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1)
                grid = cell.repeat(na, 1).unsqueeze(0)
                anc = getattr(self, f"anc{k}") \
                    .repeat_interleave(hw, dim=0).unsqueeze(0)
                xy = (flat[..., :2] * 2.0 - 0.5 + grid) * self.strides[k]
                wh = (flat[..., 2:4] * 2.0) ** 2 * anc
                preds.append(torch.cat([xy, wh, flat[..., 4:]], -1))
            p = torch.cat(preds, 1)
            boxes = torch.cat([p[..., :2] - p[..., 2:4] / 2,
                               p[..., :2] + p[..., 2:4] / 2], -1)
            return torch.cat([boxes, p[..., 4:]], -1)

    class V5Model(nn.Module):
        """yolox trunk (s2d stem + cspdarknet + csppafpn) + plain 1x1
        simple head + the same anchor decode as V7Model."""

        def __init__(self):
            super().__init__()
            pb, sb = params["backbone"], stats.get("backbone", {})
            depths = meta["backbone_depths"]
            dw = meta.get("backbone_depthwise", False)
            self.stem = ConvBlock(*sub(pb["stem"], sb["stem"], "conv"))
            self.downs = nn.ModuleList(
                [dw_or_conv(pb, sb, f"stage{i + 1}_down", 2, dw)
                 for i in range(4)])
            self.spp = SPP(*sub(pb, sb, "stage4_spp"))
            self.csps = nn.ModuleList(
                [CSP(*sub(pb, sb, f"stage{i + 1}_csp"), depths[i],
                     i != 3, dw) for i in range(4)])
            self.out_keys = list(meta["backbone_outputs"])

            pn, sn = params["neck"], stats.get("neck", {})
            nd = meta["neck_depths"][0]
            dwn = meta.get("neck_depthwise", False)
            self.shrink1 = ConvBlock(*sub(pn, sn, "shrink_conv1"))
            self.p5p4 = CSP(*sub(pn, sn, "p5_p4"), nd, False, dwn)
            self.shrink2 = ConvBlock(*sub(pn, sn, "shrink_conv2"))
            self.p4p3 = CSP(*sub(pn, sn, "p4_p3"), nd, False, dwn)
            self.down1 = dw_or_conv(pn, sn, "downsample_conv1", 2, dwn)
            self.n3n4 = CSP(*sub(pn, sn, "n3_n4"), nd, False, dwn)
            self.down2 = dw_or_conv(pn, sn, "downsample_conv2", 2, dwn)
            self.n4n5 = CSP(*sub(pn, sn, "n4_n5"), nd, False, dwn)

            ph = params["head"]
            self.convs = nn.ModuleList()
            for k in range(3):
                w = ph[f"conv{k}"]["kernel"].transpose(3, 2, 0, 1)
                conv = nn.Conv2d(w.shape[1], w.shape[0], 1)
                with torch.no_grad():
                    conv.weight.copy_(_t(torch, w))
                    conv.bias.copy_(_t(torch, ph[f"conv{k}"]["bias"]))
                self.convs.append(conv)
            self.strides = [float(s) for s in meta["strides"]]
            self.na = int(meta.get("num_anchor", 3))
            for k, lvl in enumerate(meta["anchors"]):
                self.register_buffer(
                    f"anc{k}", torch.tensor(lvl, dtype=torch.float32))

        def forward(self, x):
            b, c, h, w = x.shape
            x = x.reshape(b, c, h // 2, 2, w // 2, 2)
            x = x.permute(0, 5, 3, 1, 2, 4).reshape(b, 4 * c, h // 2, w // 2)
            x = self.stem(x)
            feats = {"stem": x}
            for i in range(4):
                x = self.downs[i](x)
                if i == 3:
                    x = self.spp(x)
                x = self.csps[i](x)
                feats[f"stage{i + 1}"] = x
            c3, c4, c5 = [feats[k] for k in self.out_keys]
            p5e = self.shrink1(c5)
            p4 = self.p5p4(torch.cat(
                [F.interpolate(p5e, scale_factor=2.0), c4], 1))
            p4e = self.shrink2(p4)
            p3 = self.p4p3(torch.cat(
                [F.interpolate(p4e, scale_factor=2.0), c3], 1))
            n4 = self.n3n4(torch.cat([self.down1(p3), p4e], 1))
            n5 = self.n4n5(torch.cat([self.down2(n4), p5e], 1))

            preds = []
            for k, feat in enumerate([p3, n4, n5]):
                lvl = self.convs[k](feat)
                bk, ck, hk, wk = lvl.shape
                na, hw = self.na, hk * wk
                flat = lvl.reshape(bk, na, ck // na, hw) \
                    .permute(0, 1, 3, 2).reshape(bk, na * hw, ck // na)
                flat = torch.sigmoid(flat)
                gy, gx = torch.meshgrid(
                    torch.arange(hk, dtype=torch.float32),
                    torch.arange(wk, dtype=torch.float32), indexing="ij")
                cell = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1)
                grid = cell.repeat(na, 1).unsqueeze(0)
                anc = getattr(self, f"anc{k}") \
                    .repeat_interleave(hw, dim=0).unsqueeze(0)
                xy = (flat[..., :2] * 2.0 - 0.5 + grid) * self.strides[k]
                wh = (flat[..., 2:4] * 2.0) ** 2 * anc
                preds.append(torch.cat([xy, wh, flat[..., 4:]], -1))
            p = torch.cat(preds, 1)
            boxes = torch.cat([p[..., :2] - p[..., 2:4] / 2,
                               p[..., :2] + p[..., 2:4] / 2], -1)
            return torch.cat([boxes, p[..., 4:]], -1)

    family = meta.get("family", "yolox")
    m = {"yolov7": V7Model, "yolov5": V5Model}.get(family, Model)()
    m.eval()
    return m


def export_torchscript(params, stats, meta, out_path: str, size: int,
                       batch: int = 1):
    """Trace + torch.jit.save; returns the example output for verification."""
    import torch

    m = build_torch_model(params, stats, meta)
    example = torch.zeros(batch, 3, size, size)
    with torch.no_grad():
        ts = torch.jit.trace(m, example)
    torch.jit.save(ts, out_path)
    return ts
