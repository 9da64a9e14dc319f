"""Torch CPU mirror of the FULL BASINet (tests-only oracle).

Mirrors basi_tpu.models exactly — same module names, shapes, resize
conventions (bilinear align_corners=False), GroupNorm grouping, CoordConv
ordering — so the full-model converter can be golden-tested end to end
(conv transposes, GN/BN semantics, einsum ordering all verified at once).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_ref import ResNet50Trunk, VGG16Features


def _resize(x, hw):
    return F.interpolate(x, size=hw, mode="bilinear", align_corners=False)


def _coords(n, h, w, device):
    ys = torch.linspace(-1, 1, h, device=device)
    xs = torch.linspace(-1, 1, w, device=device)
    yy = ys.view(1, 1, h, 1).expand(n, 1, h, w)
    xx = xs.view(1, 1, 1, w).expand(n, 1, h, w)
    return torch.cat([xx, yy], dim=1)  # (N, 2, H, W) channel order (x, y)


class FPN(nn.Module):
    def __init__(self, in_chs, ch=256):
        super().__init__()
        for i, c in enumerate(in_chs):
            setattr(self, f"lateral{i}", nn.Conv2d(c, ch, 1))
            setattr(self, f"smooth{i}", nn.Conv2d(ch, ch, 3, padding=1))
        self.n = len(in_chs)

    def forward(self, feats):
        lats = [getattr(self, f"lateral{i}")(f) for i, f in enumerate(feats)]
        outs = [None] * self.n
        prev = lats[-1]
        outs[-1] = prev
        for i in range(self.n - 2, -1, -1):
            prev = lats[i] + _resize(prev, lats[i].shape[-2:])
            outs[i] = prev
        return [getattr(self, f"smooth{i}")(o) for i, o in enumerate(outs)]


class SaliencyHead(nn.Module):
    def __init__(self, ch_in=256, ch=64, levels=4):
        super().__init__()
        for i in range(levels):
            setattr(self, f"tower{i}", nn.Conv2d(ch_in, ch, 3, padding=1))
            setattr(self, f"out{i}", nn.Conv2d(ch, 1, 1))
        self.fuse = nn.Conv2d(ch * levels, 1, 1)
        self.levels = levels

    def forward(self, pyramid):
        base_hw = pyramid[0].shape[-2:]
        logits, feats = [], []
        for i, p in enumerate(pyramid):
            f = F.relu(getattr(self, f"tower{i}")(p))
            logits.append(_resize(getattr(self, f"out{i}")(f), base_hw))
            feats.append(_resize(f, base_hw))
        fused = self.fuse(torch.cat(feats, dim=1))
        return fused, logits


class MaskFeatureHead(nn.Module):
    def __init__(self, ch_in=256, ch=128, embed=64, levels=4):
        super().__init__()
        for i in range(levels):
            cin = ch_in + (2 if i == levels - 1 else 0)
            setattr(self, f"level{i}", nn.Conv2d(cin, ch, 3, padding=1))
            setattr(self, f"gn{i}", nn.GroupNorm(32, ch))
        self.embed = nn.Conv2d(ch, embed, 1)
        self.levels = levels

    def forward(self, pyramid):
        base_hw = pyramid[0].shape[-2:]
        acc = None
        for i, p in enumerate(pyramid):
            if i == self.levels - 1:
                n, _, h, w = p.shape
                p = torch.cat([p, _coords(n, h, w, p.device)], dim=1)
            f = F.relu(getattr(self, f"gn{i}")(getattr(self, f"level{i}")(p)))
            f = _resize(f, base_hw)
            acc = f if acc is None else acc + f
        return self.embed(acc)


class InstanceKernelHead(nn.Module):
    def __init__(self, ch_in=256, ch=128, embed=64, grid=16, depth=3):
        super().__init__()
        for i in range(depth):
            cin = (ch_in + 2) if i == 0 else ch
            setattr(self, f"tower{i}", nn.Conv2d(cin, ch, 3, padding=1))
            setattr(self, f"gn{i}", nn.GroupNorm(32, ch))
        self.score = nn.Conv2d(ch, 1, 3, padding=1)
        self.kernel = nn.Conv2d(ch, embed, 3, padding=1)
        self.grid = grid
        self.depth = depth

    def forward(self, feat):
        n, _, h, w = feat.shape
        x = torch.cat([feat, _coords(n, h, w, feat.device)], dim=1)
        x = _resize(x, (self.grid, self.grid))
        for i in range(self.depth):
            x = F.relu(getattr(self, f"gn{i}")(getattr(self, f"tower{i}")(x)))
        return self.score(x), self.kernel(x)


class RefineHead(nn.Module):
    """Mirror of basi_tpu.models.heads.RefineHead (BASNet-style RRM)."""

    def __init__(self, ch=64, depth=3):
        super().__init__()
        self.depth = depth
        names = (["in"] + [f"down{i}" for i in range(depth)] + ["bridge"]
                 + [f"up{i}" for i in range(depth)])
        for n in names:
            cin = (1 if n == "in" else 2 * ch if n.startswith("up") else ch)
            setattr(self, f"conv_{n}", nn.Conv2d(cin, ch, 3, padding=1))
            setattr(self, f"gn_{n}", nn.GroupNorm(8, ch))
        self.out = nn.Conv2d(ch, 1, 1)

    def _block(self, x, name):
        return F.relu(getattr(self, f"gn_{name}")(
            getattr(self, f"conv_{name}")(x)))

    def forward(self, prob):
        x = self._block(prob, "in")
        skips = []
        for i in range(self.depth):
            skips.append(x)
            x = F.max_pool2d(x, 2)
            x = self._block(x, f"down{i}")
        x = self._block(x, "bridge")
        for i in reversed(range(self.depth)):
            x = _resize(x, skips[i].shape[2:])
            x = torch.cat([x, skips[i]], dim=1)
            x = self._block(x, f"up{i}")
        return self.out(x)


class TorchBASINet(nn.Module):
    def __init__(self, stage_sizes=(3, 4, 6, 3), fpn_ch=256, mask_ch=64,
                 grid=16, backbone="resnet", refine=False):
        super().__init__()
        if backbone.startswith("vgg"):
            depths = {"vgg16": (2, 2, 3, 3, 3),
                      "vgg19": (2, 2, 4, 4, 4)}[backbone]
            self.backbone = VGG16Features(depths)
            in_chs = [256, 512, 512, 512]
        else:
            self.backbone = ResNet50Trunk(stage_sizes)
            in_chs = [256, 512, 1024, 2048]
        self.fpn = FPN(in_chs, fpn_ch)
        self.saliency = SaliencyHead(fpn_ch, 64, 4)
        self.maskfeat = MaskFeatureHead(fpn_ch, 128, mask_ch, 4)
        self.instance = InstanceKernelHead(fpn_ch, 128, mask_ch, grid, 3)
        self.refine = RefineHead(64, 3) if refine else None

    def forward(self, x):
        feats = self.backbone(x)
        pyramid = self.fpn(list(feats))
        sal, sal_aux = self.saliency(pyramid)
        if self.refine is not None:
            sal = sal + self.refine(torch.sigmoid(sal))
        mask_feats = self.maskfeat(pyramid)
        scores, kernels = self.instance(pyramid[1])
        n, e, s1, s2 = kernels.shape
        k = kernels.permute(0, 2, 3, 1).reshape(n, s1 * s2, e)
        mf = mask_feats.permute(0, 2, 3, 1)  # (N, H, W, E)
        mask_logits = torch.einsum("nhwe,nke->nkhw", mf, k)
        return {
            "saliency": sal, "saliency_aux": sal_aux,
            "cell_scores": scores, "cell_kernels": kernels,
            "mask_feats": mask_feats, "mask_logits": mask_logits,
        }
