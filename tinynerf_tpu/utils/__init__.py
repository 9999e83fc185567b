from tinynerf_tpu.utils.metrics import mse2psnr
