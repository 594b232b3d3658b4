"""Measure the reference-equivalent PyTorch-CPU baseline.

BASELINE.md requires measured (not copied) numbers: the reference publishes
none.  This harness builds a PGU-Net+ stage-4 topology in torch (same layer
graph as SURVEY.md §2b: inverted-width encoder 64->512 with fixed 16x16
bottleneck, bilinear-upsample decoder, summed multi-scale 1x1 heads) and
times the flagship benchmark config: 256x256 binary-segmentation inference
emitting uncertainty maps (BASELINE.json config 2).

Run:  python tools/baseline_torch.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

ENCODER = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 512)]
DECODER = [(1024, 256), (512, 128), (256, 64), (128, 64)]


def block(cin: int, cout: int) -> nn.Sequential:
    layers = []
    for i, o in ((cin, cout), (cout, cout)):
        layers += [nn.Conv2d(i, o, 3, padding=1), nn.BatchNorm2d(o), nn.ReLU(True)]
    return nn.Sequential(*layers)


class Stage4Net(nn.Module):
    """PGU-Net+ stage-4 topology (layer graph per SURVEY.md §2b)."""

    def __init__(self, num_classes: int = 1):
        super().__init__()
        self.encoder = nn.ModuleList(block(i, o) for i, o in ENCODER)
        self.decoder = nn.ModuleList(block(i, o) for i, o in DECODER)
        self.heads = nn.ModuleList(
            nn.Conv2d(o, num_classes, 1) for _, o in DECODER
        )

    def forward(self, x):
        skips = []
        for level, enc in enumerate(self.encoder):
            if level > 0:
                x = F.max_pool2d(x, 2)
            x = enc(x)
            skips.append(x)
        out = None
        full = skips[0].shape[-1]
        for dec, head, skip in zip(self.decoder, self.heads, reversed(skips[:-1])):
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
            x = dec(torch.cat([skip, x], dim=1))
            logits = head(x)
            if logits.shape[-1] != full:
                logits = F.interpolate(
                    logits, size=(full, full), mode="bilinear", align_corners=True
                )
            out = logits if out is None else out + logits
        return out


@torch.no_grad()
def bench_inference(batch: int, iters: int, warmup: int = 3) -> dict:
    model = Stage4Net().eval()
    x = torch.rand(batch, 3, 256, 256)
    for _ in range(warmup):
        probs = torch.sigmoid(model(x))
        _ = 1.0 - 2.0 * torch.abs(probs - 0.5)
    t0 = time.perf_counter()
    for _ in range(iters):
        probs = torch.sigmoid(model(x))
        unc = 1.0 - 2.0 * torch.abs(probs - 0.5)
    dt = time.perf_counter() - t0
    return {
        "img_per_s": batch * iters / dt,
        "ms_per_batch": 1e3 * dt / iters,
        "batch": batch,
        "iters": iters,
        "threads": torch.get_num_threads(),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    res = bench_inference(args.batch, args.iters)
    print(json.dumps(res))


def bench_stage1_train(batch: int = 16, iters: int = 10, warmup: int = 2) -> dict:
    """BASELINE.json config 1: stage-1 32x32 binary seg fwd/bwd, batch 16."""
    enc = [(3, 512), (512, 512)]
    dec = [(1024, 256)]

    class Stage1(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.ModuleList(block(i, o) for i, o in enc)
            self.decoder = nn.ModuleList(block(i, o) for i, o in dec)
            self.head = nn.Conv2d(256, 1, 1)

        def forward(self, x):
            x1 = self.encoder[0](x)
            x2 = self.encoder[1](F.max_pool2d(x1, 2))
            u = F.interpolate(x2, scale_factor=2, mode="bilinear",
                              align_corners=True)
            return self.head(self.decoder[0](torch.cat([x1, u], 1)))

    model = Stage1().train()
    opt = torch.optim.RMSprop(model.parameters(), lr=3e-4, weight_decay=1e-4)
    crit = nn.BCEWithLogitsLoss(pos_weight=torch.tensor([5.0]))
    x = torch.rand(batch, 3, 32, 32)
    y = (torch.rand(batch, 1, 32, 32) > 0.7).float()

    def step():
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return {"train_img_per_s": batch * iters / dt,
            "ms_per_step": 1e3 * dt / iters, "batch": batch}
