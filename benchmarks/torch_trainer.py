"""PyTorch-CPU TinyNeRF *trainer* on the synthetic npz — the offline
training-dynamics parity oracle.

The north star ("match reference PSNR at 20k on Lego",
/root/reference/src/utils.py:7-9) cannot be verified without egress, so
this isolates "trainer equivalence" from "dataset identity": train the
reference's exact pipeline (src/train.py:105-128 semantics — one image
per step, random pixel rays, jittered stratified samples, Adam 5e-4,
white background) in torch on the SAME synthetic dataset the TPU
trainer uses, evaluate held-out-view PSNR at checkpoints, and compare
trajectories (table in BASELINE.md). Model/encoding/composite formulas
are re-derived as in benchmarks/torch_baseline.py and
tests/test_torch_parity.py (encoding order matches ops/encoding.py,
which matches the reference's [x, sin(2^k x), cos(2^k x)] order).

Run:  python -m benchmarks.torch_trainer  (CPU; ~2.3h for 2000 iters
on one core) -> benchmarks/torch_trajectory.json
"""

from __future__ import annotations

import argparse
import json
import time


def build_model(torch, in_dim: int):
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

    return MLP()


def encode(torch, x, num_freqs: int):
    enc = [x]
    for k in range(num_freqs):
        f = 2.0**k
        enc += [torch.sin(x * f), torch.cos(x * f)]
    return torch.cat(enc, dim=-1)


def get_rays(torch, H, W, focal, c2w):
    j, i = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    dirs = torch.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -torch.ones_like(i)], -1
    )
    rd = (dirs[..., None, :] * c2w[:3, :3]).sum(-1)
    rd = rd / rd.norm(dim=-1, keepdim=True)
    ro = c2w[:3, 3].expand(rd.shape)
    return ro.reshape(-1, 3), rd.reshape(-1, 3)


def composite(torch, rgb, sigma, z, rd):
    deltas = torch.cat([z[:, 1:] - z[:, :-1], torch.full_like(z[:, :1], 1e10)], -1)
    deltas = deltas * rd.norm(dim=-1, keepdim=True)
    alpha = 1 - torch.exp(-sigma * deltas)
    accum = torch.cumprod(1 - alpha + 1e-10, dim=-1)
    trans = torch.cat([torch.ones_like(accum[:, :1]), accum[:, :-1]], -1)
    w = alpha * trans
    return (w[..., None] * rgb).sum(-2) + (1 - w.sum(-1, keepdim=True))


def main(
    iters: int = 2000,
    n_rand: int = 2048,
    n_samples: int = 64,
    num_freqs: int = 10,
    holdout: int = 4,
    eval_every: int = 500,
    data_path: str = "data/synthetic_tiny_nerf.npz",
    out_path: str = "benchmarks/torch_trajectory.json",
    chunk: int = 4096,
) -> None:
    import numpy as np
    import torch

    torch.manual_seed(0)
    np.random.seed(0)

    d = np.load(data_path)
    images = torch.from_numpy(d["images"].astype(np.float32))
    poses = torch.from_numpy(d["poses"].astype(np.float32))
    focal = float(d["focal"])
    n_images, H, W, _ = images.shape
    n_train = n_images - holdout

    in_dim = 3 + 3 * 2 * num_freqs
    model = build_model(torch, in_dim)
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)

    # Precompute rays for all poses (reference train.py:94-101).
    ro_all, rd_all = [], []
    for p in poses:
        ro, rd = get_rays(torch, H, W, focal, p)
        ro_all.append(ro)
        rd_all.append(rd)
    ro_all = torch.stack(ro_all)
    rd_all = torch.stack(rd_all)
    pix_all = images.reshape(n_images, H * W, 3)
    near, far = 2.0, 6.0
    t_lin = torch.linspace(0.0, 1.0, n_samples)
    z_base = near * (1 - t_lin) + far * t_lin

    @torch.no_grad()
    def eval_heldout():
        model.eval()
        scores = []
        for vi in range(n_train, n_images):
            outs = []
            for c0 in range(0, H * W, chunk):
                ro = ro_all[vi][c0 : c0 + chunk]
                rd = rd_all[vi][c0 : c0 + chunk]
                z = z_base.expand(ro.shape[0], n_samples)
                pts = ro[:, None] + rd[:, None] * z[..., None]
                rgb, sigma = model(encode(torch, pts.reshape(-1, 3), num_freqs))
                comp = composite(
                    torch,
                    rgb.reshape(-1, n_samples, 3),
                    sigma.reshape(-1, n_samples),
                    z,
                    rd,
                )
                outs.append(comp)
            img = torch.cat(outs).clamp(0, 1).reshape(H, W, 3)
            mse = ((img - images[vi]) ** 2).mean()
            scores.append(float(-10.0 * torch.log10(mse.clamp_min(1e-10))))
        model.train()
        return float(np.mean(scores)), [round(s, 3) for s in scores]

    trajectory = []
    t_start = time.time()
    for step in range(1, iters + 1):
        img_i = (step - 1) % n_train
        inds = torch.randint(0, H * W, (n_rand,))
        ro = ro_all[img_i][inds]
        rd = rd_all[img_i][inds]
        target = pix_all[img_i][inds]

        z = z_base.expand(n_rand, n_samples)
        mids = 0.5 * (z[:, :-1] + z[:, 1:])
        upper = torch.cat([mids, z[:, -1:]], -1)
        lower = torch.cat([z[:, :1], mids], -1)
        z = lower + (upper - lower) * torch.rand_like(z)
        pts = ro[:, None] + rd[:, None] * z[..., None]
        rgb, sigma = model(encode(torch, pts.reshape(-1, 3), num_freqs))
        comp = composite(
            torch, rgb.reshape(-1, n_samples, 3), sigma.reshape(-1, n_samples), z, rd
        )
        loss = ((comp - target) ** 2).mean()
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()

        if step % eval_every == 0 or step == iters:
            psnr_mean, per_view = eval_heldout()
            rec = {
                "step": step,
                "heldout_psnr_mean": round(psnr_mean, 3),
                "heldout_psnr_per_view": per_view,
                "train_loss": round(float(loss), 6),
                "elapsed_s": round(time.time() - t_start, 1),
            }
            trajectory.append(rec)
            print(json.dumps(rec), flush=True)
            with open(out_path, "w") as f:
                json.dump(
                    {
                        "recipe": f"{n_rand} rays x {n_samples} samples, Adam 5e-4, "
                        f"holdout={holdout}, torch CPU fp32",
                        "data": data_path,
                        "trajectory": trajectory,
                    },
                    f,
                    indent=1,
                )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=500)
    a = ap.parse_args()
    main(iters=a.iters, eval_every=a.eval_every)
