from uformer_tpu.utils.params import (  # noqa: F401
    cast_weights,
    count_params,
    init_params_fast,
)
