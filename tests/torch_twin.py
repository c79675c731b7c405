"""A torch twin of the LSS network, built from torch primitives following
the published architectures (EfficientNet: Tan & Le 2019; LSS: Philion &
Fidler 2020). Used ONLY as an independent parity oracle for the flax model +
weight converter — state-dict names match the reference checkpoint schema so
``build_name_map`` applies directly.
"""

import math

import numpy as np
import torch
import torch.nn as nn

# (expand, kernel, stride, cin, cout, repeats) — EfficientNet-B0 stages
B0_STAGES = [
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
]
BN_MOM, BN_EPS = 0.01, 1e-3


def same_pad(size, k, s):
    """TF-style static SAME padding (left, right) for one dimension."""
    out = math.ceil(size / s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


class TorchMBConv(nn.Module):
    def __init__(self, expand, k, s, cin, cout, img_hw):
        super().__init__()
        mid = cin * expand
        self.expand = expand
        self.id_skip = s == 1 and cin == cout
        if expand != 1:
            self._expand_conv = nn.Conv2d(cin, mid, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(mid, momentum=BN_MOM, eps=BN_EPS)
        ph = same_pad(img_hw[0], k, s)
        pw = same_pad(img_hw[1], k, s)
        self._pad = nn.ZeroPad2d((pw[0], pw[1], ph[0], ph[1]))
        self._depthwise_conv = nn.Conv2d(mid, mid, k, stride=s, groups=mid,
                                         bias=False)
        self._bn1 = nn.BatchNorm2d(mid, momentum=BN_MOM, eps=BN_EPS)
        se_ch = max(1, int(cin * 0.25))
        self._se_reduce = nn.Conv2d(mid, se_ch, 1)
        self._se_expand = nn.Conv2d(se_ch, mid, 1)
        self._project_conv = nn.Conv2d(mid, cout, 1, bias=False)
        self._bn2 = nn.BatchNorm2d(cout, momentum=BN_MOM, eps=BN_EPS)
        self.out_hw = (math.ceil(img_hw[0] / s), math.ceil(img_hw[1] / s))

    def forward(self, x):
        inp = x
        if self.expand != 1:
            x = torch.nn.functional.silu(self._bn0(self._expand_conv(x)))
        x = torch.nn.functional.silu(self._bn1(
            self._depthwise_conv(self._pad(x))))
        se = x.mean((2, 3), keepdim=True)
        se = self._se_expand(torch.nn.functional.silu(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.id_skip:
            x = x + inp  # eval mode: no drop-connect
        return x


class TorchTrunk(nn.Module):
    """EfficientNet-B0 trunk with the LSS endpoint harvest."""

    def __init__(self, img_hw):
        super().__init__()
        ph = same_pad(img_hw[0], 3, 2)
        pw = same_pad(img_hw[1], 3, 2)
        self._stem_pad = nn.ZeroPad2d((pw[0], pw[1], ph[0], ph[1]))
        self._conv_stem = nn.Conv2d(3, 32, 3, stride=2, bias=False)
        self._bn0 = nn.BatchNorm2d(32, momentum=BN_MOM, eps=BN_EPS)
        hw = (math.ceil(img_hw[0] / 2), math.ceil(img_hw[1] / 2))
        blocks = []
        for expand, k, s, cin, cout, reps in B0_STAGES:
            for r in range(reps):
                blk = TorchMBConv(expand, k, s if r == 0 else 1,
                                  cin if r == 0 else cout, cout, hw)
                hw = blk.out_hw
                blocks.append(blk)
        self._blocks = nn.ModuleList(blocks)

    def forward(self, x):
        endpoints = {}
        x = torch.nn.functional.silu(self._bn0(self._conv_stem(
            self._stem_pad(x))))
        prev = x
        for blk in self._blocks:
            x = blk(x)
            if prev.shape[2] > x.shape[2]:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints


class TorchUpBlock(nn.Module):
    def __init__(self, cin, cout, scale=2):
        super().__init__()
        self.up = nn.Upsample(scale_factor=scale, mode="bilinear",
                              align_corners=True)
        self.conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x1, x2):
        return self.conv(torch.cat([x2, self.up(x1)], 1))


class TorchCamEncode(nn.Module):
    def __init__(self, D, C, img_hw):
        super().__init__()
        self.D, self.C = D, C
        self.trunk = TorchTrunk(img_hw)
        self.up1 = TorchUpBlock(320 + 112, 512)
        self.depthnet = nn.Conv2d(512, D + C, 1)

    def forward(self, x):
        eps = self.trunk(x)
        x = self.up1(eps["reduction_5"], eps["reduction_4"])
        x = self.depthnet(x)
        depth = x[:, :self.D].softmax(1)
        return depth.unsqueeze(1) * x[:, self.D:self.D + self.C].unsqueeze(2)


class TorchBasic(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchBevEncode(nn.Module):
    def __init__(self, inC, outC):
        super().__init__()
        self.conv1 = nn.Conv2d(inC, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(TorchBasic(64, 64), TorchBasic(64, 64))
        self.layer2 = nn.Sequential(TorchBasic(64, 128, 2),
                                    TorchBasic(128, 128))
        self.layer3 = nn.Sequential(TorchBasic(128, 256, 2),
                                    TorchBasic(256, 256))
        self.up1 = TorchUpBlock(64 + 256, 256, scale=4)
        self.up2 = nn.Sequential(
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            nn.Conv2d(256, 128, 3, padding=1, bias=False),
            nn.BatchNorm2d(128), nn.ReLU(),
            nn.Conv2d(128, outC, 1))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x)
        x = self.layer3(self.layer2(x1))
        return self.up2(self.up1(x, x1))


class TorchLSSTwin(nn.Module):
    """camencode + bevencode with reference state-dict naming."""

    def __init__(self, D=41, C=64, outC=1, img_hw=(128, 352)):
        super().__init__()
        self.camencode = TorchCamEncode(D, C, img_hw)
        self.bevencode = TorchBevEncode(C, outC)


def randomize_bn_stats(model, rng, affine=False):
    """Give every BN non-trivial running stats so eval mode is a real test.

    ``affine=True`` also randomizes gamma/beta (default-initialized BNs
    would otherwise make scale/bias transplant bugs invisible)."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape)
                    .astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape)
                    .astype(np.float32)))
                if affine:
                    m.weight.copy_(torch.from_numpy(
                        rng.uniform(0.5, 1.5, m.weight.shape)
                        .astype(np.float32)))
                    m.bias.copy_(torch.from_numpy(
                        rng.normal(0, 0.1, m.bias.shape)
                        .astype(np.float32)))


def torch_full_lss_forward(twin, grid_conf, frustum, x, rots, trans,
                           intrins, post_rots, post_trans):
    """Full LSS forward in torch (published algorithm, written fresh):
    geometry -> camencode lift -> sort+cumsum voxel pooling -> bevencode.

    frustum: (D, fH, fW, 3) numpy. x: (B, N, 3, H, W) torch. Returns
    (B, outC, X, Y) numpy.
    """
    import torch as T
    dx = T.tensor(grid_conf.dx)
    bx = T.tensor(grid_conf.bx)
    nx = [int(v) for v in grid_conf.nx]
    B, N = x.shape[:2]
    fr = T.from_numpy(np.ascontiguousarray(frustum)).float()

    # geometry: undo augmentation, unproject, cam->ego
    pts = fr[None, None] - post_trans.view(B, N, 1, 1, 1, 3)
    pts = T.inverse(post_rots).view(B, N, 1, 1, 1, 3, 3) @ pts.unsqueeze(-1)
    pts = T.cat([pts[..., :2, :] * pts[..., 2:3, :], pts[..., 2:3, :]], dim=-2)
    combine = rots @ T.inverse(intrins)
    pts = (combine.view(B, N, 1, 1, 1, 3, 3) @ pts).squeeze(-1)
    pts = pts + trans.view(B, N, 1, 1, 1, 3)

    # camencode lift: (B*N, C, D, fh, fw) -> (B, N, D, fh, fw, C)
    D = fr.shape[0]
    imgs = x.view(B * N, *x.shape[2:])
    feats = twin.camencode(imgs)
    C = feats.shape[1]
    fh, fw = feats.shape[3], feats.shape[4]
    feats = feats.view(B, N, C, D, fh, fw).permute(0, 1, 3, 4, 5, 2)

    # voxel pooling: quantize, drop OOB, sum per voxel (cumsum trick
    # semantics == plain index_add over kept points)
    Nprime = B * N * D * fh * fw
    flat_feats = feats.reshape(Nprime, C)
    geom = ((pts - (bx - dx / 2.0)) / dx).long().view(Nprime, 3)
    batch_ix = T.arange(B).repeat_interleave(Nprime // B).unsqueeze(1)
    kept = ((geom[:, 0] >= 0) & (geom[:, 0] < nx[0])
            & (geom[:, 1] >= 0) & (geom[:, 1] < nx[1])
            & (geom[:, 2] >= 0) & (geom[:, 2] < nx[2]))
    geom_k = geom[kept]
    bix = batch_ix[kept, 0]
    f_k = flat_feats[kept]
    final = T.zeros((B, nx[2], nx[0], nx[1], C))
    lin = ((bix * nx[2] + geom_k[:, 2]) * nx[0] + geom_k[:, 0]) * nx[1] \
        + geom_k[:, 1]
    final.view(-1, C).index_add_(0, lin, f_k)
    # collapse Z (z-major channel concat), to NCHW
    bev = final.permute(0, 1, 4, 2, 3).reshape(B, nx[2] * C, nx[0], nx[1])
    return twin.bevencode(bev).detach().numpy()
