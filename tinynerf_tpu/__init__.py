"""tinynerf_tpu — a TPU-native NeRF framework (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of avihaig/tiny-nerf-pytorch
(reference mounted at /root/reference) designed TPU-first:

- a functional core of pure, jit-friendly ops (`ops/`): ray generation,
  stratified + hierarchical sampling, Fourier positional encoding, and
  alpha-composite volume rendering;
- explicit-parameter models (`models/`): the TinyNeRF MLP and the full
  NeRF upgrade (view-direction conditioning, coarse/fine);
- fused Pallas kernels (`kernels/`) for the encode->MLP->composite hot
  chain so sample points never round-trip to HBM;
- mesh/sharding utilities (`parallel/`) that scale ray batches across a
  TPU mesh with `shard_map` + XLA collectives;
- drivers (`train.py`, `main.py`, `make_gif.py`) that keep the
  reference's public surface (dataclass CLI flags, npz loader, PSNR
  logging, checkpoint save/resume, spiral-path GIF rendering).

Reference parity citations use `file:line` into /root/reference/src/.
"""

__version__ = "0.1.0"

from tinynerf_tpu.ops.rays import get_rays, get_rays_for_poses
from tinynerf_tpu.ops.sampling import stratified_samples, sample_pdf
from tinynerf_tpu.ops.encoding import positional_encoding, encoding_dim
from tinynerf_tpu.ops.volume import volume_render
from tinynerf_tpu.ops.camera import spiral_poses
from tinynerf_tpu.utils.metrics import mse2psnr
