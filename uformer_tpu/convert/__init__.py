from uformer_tpu.convert.torch_converter import (  # noqa: F401
    convert_checkpoint,
    convert_uformer,
    convert_unet,
    load_state_dict,
)
from uformer_tpu.convert.torch_exporter import (  # noqa: F401
    export_uformer,
    save_torch_checkpoint,
)
