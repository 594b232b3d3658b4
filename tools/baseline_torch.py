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


# ---------------------------------------------------------------------------
# config 3: stage-4 Herlev 7-class classification inference @224px
# (encoder walk inc+down1..down3 to the 512-ch map + GAP + MLP head,
#  layer graph per SURVEY.md §2b HerlevClassificationModel)
# ---------------------------------------------------------------------------

CLS_ENCODER = [(3, 64), (64, 128), (128, 256), (256, 512)]


class Stage4Classifier(nn.Module):
    def __init__(self, num_classes: int = 7):
        super().__init__()
        self.encoder = nn.ModuleList(block(i, o) for i, o in CLS_ENCODER)
        self.head = nn.Sequential(
            nn.Linear(512, 512), nn.ReLU(True),
            nn.Linear(512, 256), nn.ReLU(True),
            nn.Linear(256, num_classes),
        )

    def forward(self, x):
        for level, enc in enumerate(self.encoder):
            if level > 0:
                x = F.max_pool2d(x, 2)
            x = enc(x)
        return self.head(x.mean(dim=(2, 3)))


@torch.no_grad()
def bench_cls_inference(batch: int = 16, iters: int = 10, warmup: int = 2) -> dict:
    model = Stage4Classifier().eval()
    x = torch.rand(batch, 3, 224, 224)
    for _ in range(warmup):
        model(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        torch.softmax(model(x), dim=1)
    dt = time.perf_counter() - t0
    return {"img_per_s": batch * iters / dt,
            "ms_per_batch": 1e3 * dt / iters, "batch": batch}


# ---------------------------------------------------------------------------
# config 4: full progressive train 32->64->128->256 with weight transfer +
# uncertainty-weighted loss (tiny fixed workload; identical on the jax side)
# ---------------------------------------------------------------------------

STAGE_TOPOS = {
    1: ([(3, 512), (512, 512)], [(1024, 256)]),
    2: ([(3, 256), (256, 512), (512, 512)], [(1024, 256), (512, 128)]),
    3: ([(3, 128), (128, 256), (256, 512), (512, 512)],
        [(1024, 256), (512, 128), (256, 64)]),
    4: (ENCODER, DECODER),
}
STAGE_RES = {1: 32, 2: 64, 3: 128, 4: 256}


class StageNet(nn.Module):
    """PGU-Net+ stage topology with summed multi-scale heads."""

    def __init__(self, stage: int, num_classes: int = 1):
        super().__init__()
        enc, dec = STAGE_TOPOS[stage]
        self.encoder = nn.ModuleList(block(i, o) for i, o in enc)
        self.decoder = nn.ModuleList(block(i, o) for i, o in dec)
        self.heads = nn.ModuleList(nn.Conv2d(o, num_classes, 1) for _, o in dec)

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


def bench_progressive_train(batch: int = 4, steps_per_stage: int = 32) -> dict:
    """Config 4: one pass over all 4 stages with transfer + uncertainty.

    Workload pinned at 32 steps/stage x batch 4 (512 images) so the number
    measures sustained per-step compute, not per-stage setup (VERDICT r2
    #7: the old 2-step workload mostly measured dispatch round trips)."""
    torch.manual_seed(0)
    models = {s: StageNet(s) for s in (1, 2, 3, 4)}
    crit = nn.BCEWithLogitsLoss(pos_weight=torch.tensor([5.0]), reduction="none")
    x64 = torch.rand(batch, 3, 256, 256)
    y64 = (torch.rand(batch, 1, 256, 256) > 0.7).float()

    n_images = 0
    t0 = time.perf_counter()
    for stage in (1, 2, 3, 4):
        model = models[stage]
        if stage > 1:  # name-free transfer stand-in: copy matching shapes
            prev_sd = models[stage - 1].state_dict()
            sd = model.state_dict()
            for k, v in prev_sd.items():
                if k in sd and sd[k].shape == v.shape:
                    sd[k] = v
            model.load_state_dict(sd)
        model.train()
        opt = torch.optim.RMSprop(model.parameters(),
                                  lr=3e-4 if stage == 1 else 1e-4,
                                  weight_decay=1e-4)
        res = STAGE_RES[stage]
        for _ in range(steps_per_stage):
            data = F.interpolate(x64, size=(res, res), mode="bilinear",
                                 align_corners=True)
            target = F.interpolate(y64, size=(res, res), mode="nearest")
            opt.zero_grad()
            out = model(data)
            pixel = crit(out, target)
            if stage > 1:
                with torch.no_grad():
                    prev = models[stage - 1].eval()
                    pres = STAGE_RES[stage - 1]
                    dp = F.interpolate(data, size=(pres, pres), mode="bilinear",
                                       align_corners=True)
                    probs = torch.sigmoid(prev(dp))
                    probs = F.interpolate(probs, size=(res, res),
                                          mode="bilinear", align_corners=True)
                    w = 1.0 + (1.0 - 2.0 * torch.abs(probs - 0.5))
                loss = (pixel * w).mean()
            else:
                loss = pixel.mean()
            loss.backward()
            opt.step()
            n_images += batch
    dt = time.perf_counter() - t0
    return {"img_per_s": n_images / dt, "wall_s": dt,
            "batch": batch, "steps_per_stage": steps_per_stage}


def bench_aug_train(batch: int = 8, iters: int = 5, warmup: int = 1) -> dict:
    """Config 5: stage-4 256px train step with host-side augmentation
    (flips/rot90/brightness-contrast on numpy, the aug-dataset path)."""
    import numpy as np

    torch.manual_seed(0)
    model = StageNet(4).train()
    opt = torch.optim.RMSprop(model.parameters(), lr=1e-4, weight_decay=1e-4)
    crit = nn.BCEWithLogitsLoss(pos_weight=torch.tensor([5.0]))
    rng = np.random.default_rng(0)
    imgs = rng.random((batch, 256, 256, 3), dtype=np.float32)
    masks = (rng.random((batch, 256, 256, 1)) > 0.7).astype(np.float32)

    def augment(im, ma):
        im, ma = im.copy(), ma.copy()
        for b in range(im.shape[0]):
            if rng.random() < 0.5:
                im[b], ma[b] = im[b, :, ::-1], ma[b, :, ::-1]
            if rng.random() < 0.5:
                im[b], ma[b] = im[b, ::-1], ma[b, ::-1]
            k = int(rng.integers(0, 4))
            im[b], ma[b] = np.rot90(im[b], k), np.rot90(ma[b], k)
            im[b] = np.clip(im[b] * rng.uniform(0.8, 1.2)
                            + rng.uniform(-0.1, 0.1), 0, 1)
        return (torch.from_numpy(np.ascontiguousarray(im)).permute(0, 3, 1, 2),
                torch.from_numpy(np.ascontiguousarray(ma)).permute(0, 3, 1, 2))

    def step():
        x, y = augment(imgs, masks)
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
    return {"img_per_s": batch * iters / dt,
            "ms_per_step": 1e3 * dt / iters, "batch": batch}


BENCHES = {
    1: lambda a: bench_stage1_train(a.batch or 16, a.iters),
    2: lambda a: bench_inference(a.batch or 8, a.iters),
    3: lambda a: bench_cls_inference(a.batch or 16, a.iters),
    4: lambda a: bench_progressive_train(a.batch or 4, a.steps),
    5: lambda a: bench_aug_train(a.batch or 8, a.iters),
}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=2, choices=sorted(BENCHES))
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--steps", type=int, default=32,
                   help="config 4: steps per stage")
    args = p.parse_args()
    res = BENCHES[args.config](args)
    res["config"] = args.config
    print(json.dumps(res))
