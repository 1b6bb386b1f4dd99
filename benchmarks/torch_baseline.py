"""PyTorch-CPU baseline: a same-compute forward of the flagship model.

This mirrors the reference's substrate (PyTorch) and our BaseModel
architecture (PSMNet encoder, plane-sweep cost volume over V views x D
depths via grid_sample, 3D-CNN fusion, transposed-conv decoder) so that
bench.py's ``vs_baseline`` compares identical FLOP budgets. It is a
benchmark stand-in, not a training path.
"""

from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

D = 64
FEAT = 64
H, W = 256, 384
VIEWS = 2


def convbn(cin, cout, k, s, p, d=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, d if d > 1 else p, dilation=d, bias=False),
        nn.BatchNorm2d(cout, track_running_stats=False))


class Block(nn.Module):
    def __init__(self, cin, cout, stride, dilation=1):
        super().__init__()
        self.c1 = nn.Sequential(convbn(cin, cout, 3, stride, 1, dilation),
                                nn.ReLU(inplace=True))
        self.c2 = convbn(cout, cout, 3, 1, 1, dilation)
        self.ds = (nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                 nn.BatchNorm2d(cout, track_running_stats=False))
                   if (stride != 1 or cin != cout) else None)

    def forward(self, x):
        out = self.c2(self.c1(x))
        if self.ds is not None:
            x = self.ds(x)
        return out + x


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        s0, s1, s2, s3 = 16, 32, 64, 128
        self.stem = nn.Sequential(
            convbn(3, s1, 3, 2, 1), nn.ReLU(True),
            convbn(s1, s1, 3, 1, 1), nn.ReLU(True),
            convbn(s1, s1, 3, 1, 1), nn.ReLU(True))
        self.l1 = nn.Sequential(*[Block(s1, s1, 1) for _ in range(3)])
        self.l2 = nn.Sequential(Block(s1, s2, 2),
                                *[Block(s2, s2, 1) for _ in range(s0 - 1)])
        self.l3 = nn.Sequential(Block(s2, s3, 1),
                                *[Block(s3, s3, 1) for _ in range(2)])
        self.l4 = nn.Sequential(*[Block(s3, s3, 1, 2) for _ in range(3)])
        self.branches = nn.ModuleList([
            nn.Sequential(nn.AvgPool2d(w, w), convbn(s3, s1, 1, 1, 0),
                          nn.ReLU(True)) for w in (64, 32, 16, 8)])
        self.last = nn.Sequential(convbn(s1 * 4 + s2 + s3, s3, 3, 1, 1),
                                  nn.ReLU(True),
                                  nn.Conv2d(s3, FEAT, 1, bias=False))

    def forward(self, x):
        x = self.stem(x)
        o1 = self.l1(x)
        raw = self.l2(o1)
        skip = self.l4(self.l3(raw))
        hw = skip.shape[2:]
        bs = [F.interpolate(b(skip), hw, mode="bilinear", align_corners=True)
              for b in self.branches]
        feat = self.last(torch.cat([raw, skip] + bs[::-1], 1))
        return o1, raw, feat


class Base3D(nn.Module):
    def __init__(self, cin):
        super().__init__()
        def cb(i, o):
            return nn.Sequential(nn.Conv3d(i, o, 3, 1, 1, bias=False),
                                 nn.BatchNorm3d(o, track_running_stats=False))
        self.d0 = nn.Sequential(cb(cin, 32), nn.ReLU(True), cb(32, 32),
                                nn.ReLU(True))
        self.res = nn.ModuleList(
            [nn.Sequential(cb(32, 32), nn.ReLU(True), cb(32, 32))
             for _ in range(2)])
        self.cls = nn.Sequential(cb(32, 32), nn.ReLU(True),
                                 nn.Conv3d(32, 1, 3, 1, 1, bias=False))

    def forward(self, v):
        x = self.d0(v)
        for r in self.res:
            x = r(x) + x
        return self.cls(x).squeeze(1)


class Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        cin = D + FEAT
        self.c0 = nn.Sequential(nn.Conv2d(cin, cin, 3, 1, 1), nn.LeakyReLU(),
                                nn.Conv2d(cin, cin, 3, 1, 1), nn.LeakyReLU())
        self.t0 = nn.Sequential(nn.ConvTranspose2d(cin, D, 4, 2, 1),
                                nn.LeakyReLU())
        c1 = D + 32
        self.c1 = nn.Sequential(nn.Conv2d(c1, c1, 3, 1, 1), nn.LeakyReLU(),
                                nn.Conv2d(c1, c1, 3, 1, 1), nn.LeakyReLU())
        self.t1 = nn.Sequential(nn.ConvTranspose2d(c1, D, 4, 2, 1),
                                nn.LeakyReLU())
        c2 = D + 3
        self.c2 = nn.Sequential(nn.Conv2d(c2, c2, 3, 1, 1), nn.LeakyReLU(),
                                nn.Conv2d(c2, D, 3, 1, 1), nn.LeakyReLU(),
                                nn.Conv2d(D, D, 3, 1, 1))

    def forward(self, dpv, f4, f2, rgb):
        x = self.t0(self.c0(torch.cat([dpv, f4], 1)))
        x = self.t1(self.c1(torch.cat([x, f2], 1)))
        x = self.c2(torch.cat([x, rgb], 1))
        return F.log_softmax(x, 1)


class Flagship(nn.Module):
    def __init__(self):
        super().__init__()
        self.enc = Encoder()
        self.conv0 = nn.Sequential(nn.Conv2d(D, D, 3, 1, 1), nn.LeakyReLU(),
                                   nn.Conv2d(D, D, 3, 1, 1), nn.LeakyReLU(),
                                   nn.Conv2d(D, D, 3, 1, 1))
        self.b3d = Base3D(5)
        self.dec = Decoder()

    def forward(self, rgb, d_candi, grids):
        b, t = rgb.shape[:2]
        flat = rgb.reshape(b * t, *rgb.shape[2:])
        f1, raw, feat = self.enc(flat)
        img = F.avg_pool2d(flat, 4)
        fa = torch.cat([feat, img], 1).reshape(b, t, -1, H // 4, W // 4)
        raw = raw.reshape(b, t, -1, H // 4, W // 4)
        f1 = f1.reshape(b, t, -1, H // 2, W // 2)

        # plane sweep: V-1 src views x D depths of grid_sample + L2
        cost = torch.zeros(b, D, H // 4, W // 4)
        ref = fa[:, -1]
        for v in range(t - 1):
            src = fa[:, v].repeat(D, 1, 1, 1)
            warped = F.grid_sample(src, grids, align_corners=False)
            cost = cost + ((warped - ref.repeat(D, 1, 1, 1)) ** 2).sum(1).reshape(
                b, D, H // 4, W // 4)

        bv = F.log_softmax(self.conv0(cost / 10.0), 1)

        # diagonal warped features
        warped_feats = []
        for v in range(t):
            src = raw[:, v].repeat(D, 1, 1, 1)
            w = F.grid_sample(src, grids, align_corners=False)
            w = w.reshape(b, D, D, H // 4, W // 4)
            warped_feats.append(torch.diagonal(w, dim1=1, dim2=2)
                                .permute(0, 3, 1, 2))
        prev = torch.full_like(bv, float(np.log(1.0 / D)))
        vol = torch.stack([bv, prev, prev] + warped_feats, 1)
        resi = self.b3d(vol)
        bv_upd = F.log_softmax(bv + resi, 1)

        return self.dec(torch.exp(bv_upd), fa[:, -1, :-3], f1[:, -1],
                        rgb[:, -1])


def measure_fps(batch: int = 1, iters: int = 3, warmup: int = 1) -> float:
    torch.set_num_threads(torch.get_num_threads())
    model = Flagship().eval()
    rgb = torch.randn(batch, VIEWS, 3, H, W)
    d_candi = torch.linspace(5, 40, D)
    grids = torch.rand(batch * D, H // 4, W // 4, 2) * 2 - 1
    with torch.no_grad():
        for _ in range(warmup):
            model(rgb, d_candi, grids)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(rgb, d_candi, grids)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


if __name__ == "__main__":
    print(measure_fps())
