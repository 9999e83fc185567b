"""PyTorch-CPU TinyNeRF baseline — the denominator for the >=20x claim.

The reference publishes no numbers (BASELINE.md), so the speedup target
"20x faster than the PyTorch-CPU baseline" requires measuring that
baseline in-repo. This module implements the reference's training-step
math (encode -> 4-layer MLP with skip -> alpha composite -> MSE ->
Adam) directly in torch — written from the equations, not copied — and
times steady-state steps on CPU at the canonical shapes (2048 rays x
64 samples, src/train.py:22-24).
"""

from __future__ import annotations

import time


def measure_torch_cpu_rays_per_sec(
    n_rand: int = 2048,
    n_samples: int = 64,
    num_freqs: int = 10,
    warmup: int = 2,
    iters: int = 8,
) -> float:
    import numpy as np
    import torch

    torch.manual_seed(0)
    device = torch.device("cpu")
    in_dim = 3 + 3 * 2 * num_freqs

    class MLP(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l0 = torch.nn.Linear(in_dim, 128)
            self.l1 = torch.nn.Linear(128, 128)
            self.l2 = torch.nn.Linear(128 + in_dim, 128)
            self.l3 = torch.nn.Linear(128, 128)
            self.sigma = torch.nn.Linear(128, 1)
            self.rgb = torch.nn.Linear(128, 3)

        def forward(self, x):
            h = torch.relu(self.l0(x))
            h = torch.relu(self.l1(h))
            h = torch.cat([h, x], dim=-1)
            h = torch.relu(self.l2(h))
            h = torch.relu(self.l3(h))
            return torch.sigmoid(self.rgb(h)), torch.relu(self.sigma(h))

    model = MLP().to(device)
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    bands = 2.0 ** torch.arange(num_freqs, dtype=torch.float32)

    rays_o = torch.randn(n_rand, 3) * 0.1
    rays_d = torch.randn(n_rand, 3)
    rays_d = rays_d / rays_d.norm(dim=-1, keepdim=True)
    target = torch.rand(n_rand, 3)
    t_lin = torch.linspace(0.0, 1.0, n_samples)

    def step():
        z = 2.0 * (1 - t_lin) + 6.0 * t_lin
        z = z.expand(n_rand, n_samples)
        mids = 0.5 * (z[:, :-1] + z[:, 1:])
        upper = torch.cat([mids, z[:, -1:]], -1)
        lower = torch.cat([z[:, :1], mids], -1)
        z = lower + (upper - lower) * torch.rand_like(z)
        pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
        x = pts.reshape(-1, 3)
        scaled = x[:, None, :] * bands[:, None]
        enc = torch.cat(
            [x, torch.stack([scaled.sin(), scaled.cos()], dim=2).reshape(x.shape[0], -1)],
            dim=-1,
        )
        rgb, sigma = model(enc)
        rgb = rgb.reshape(n_rand, n_samples, 3)
        sigma = sigma.reshape(n_rand, n_samples)
        deltas = torch.cat([z[:, 1:] - z[:, :-1], torch.full_like(z[:, :1], 1e10)], -1)
        deltas = deltas * rays_d.norm(dim=-1, keepdim=True)
        alpha = 1 - torch.exp(-sigma * deltas)
        accum = torch.cumprod(1 - alpha + 1e-10, dim=-1)
        trans = torch.cat([torch.ones_like(accum[:, :1]), accum[:, :-1]], -1)
        w = alpha * trans
        comp = (w[..., None] * rgb).sum(-2) + (1 - w.sum(-1, keepdim=True))
        loss = ((comp - target) ** 2).mean()
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        return loss

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return n_rand * iters / dt


if __name__ == "__main__":
    print(measure_torch_cpu_rays_per_sec())
