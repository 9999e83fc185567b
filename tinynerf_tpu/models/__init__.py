from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, init_tinynerf, apply_tinynerf, count_params
