from uformer_tpu.utils.params import init_params_fast, count_params  # noqa: F401
