"""Pure functional core ops: geometry, sampling, encoding, compositing."""

from tinynerf_tpu.ops.rays import get_rays, get_rays_for_poses
from tinynerf_tpu.ops.sampling import stratified_samples, sample_pdf
from tinynerf_tpu.ops.encoding import positional_encoding, encoding_dim
from tinynerf_tpu.ops.volume import volume_render
from tinynerf_tpu.ops.camera import spiral_poses
