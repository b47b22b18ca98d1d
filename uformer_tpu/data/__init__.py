from uformer_tpu.data.augment import (  # noqa: F401
    dihedral_transform,
    mixup_batch,
    random_crop_pair,
    random_dihedral_batch,
)
