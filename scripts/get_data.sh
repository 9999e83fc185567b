#!/usr/bin/env bash
# Fetch tiny_nerf_data.npz (106 Lego images @ 100x100 + poses + focal).
# Primary URL + two mirrors, skip when already present — same surface as
# the reference downloader. When the environment has no egress, the
# framework falls back to the procedural synthetic dataset
# (tinynerf_tpu/synthetic.py) automatically.
set -euo pipefail

mkdir -p data
OUT="data/tiny_nerf_data.npz"

if [ -f "$OUT" ]; then
  echo "[skip] $OUT already exists."
  exit 0
fi

URLS=(
  "http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/tiny_nerf_data.npz"
  "https://github.com/kunkun0w0/Clean-Torch-NeRFs/raw/main/tiny_nerf_data.npz"
  "https://github.com/volunt4s/TinyNeRF-pytorch/raw/main/tiny_nerf_data.npz"
)

fetch() {
  if command -v curl >/dev/null 2>&1; then
    curl -fL --connect-timeout 15 "$1" -o "$OUT"
  else
    wget -T 15 -O "$OUT" "$1"
  fi
}

for url in "${URLS[@]}"; do
  echo "[info] trying $url"
  if fetch "$url"; then
    echo "[ok] downloaded $(wc -c < "$OUT") bytes to $OUT"
    exit 0
  fi
done

echo "[warn] all mirrors failed (no egress?); training will use the synthetic scene" >&2
exit 1
