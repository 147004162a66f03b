"""Data layer: datasets, sphere templates, jittable augmentation, latent
samplers, host->device prefetch. Rebuild of the reference's
`Generation/H5DataLoader.py` + `Common/point_operation.py` +
`Common/data_utils.py` + the template/noise helpers in
`Generation/model.py:46-180` — see each submodule for the file:line map.
"""

from sp_gan_tpu.data.augment import (
    augment_batch,
    jitter_batch,
    normalize_point_cloud,
    random_point_dropout,
    rotate_perturbation_batch,
    rotate_y_batch,
    scale_batch,
    shuffle_points_batch,
    translate_batch,
)
from sp_gan_tpu.data.h5 import (H5Dataset, SyntheticDataset,
                                SyntheticMultiClassDataset, load_h5)
from sp_gan_tpu.data.noise import masked_z, sample_z
from sp_gan_tpu.data.prefetch import prefetch_to_device
from sp_gan_tpu.data.sphere import (
    fibonacci_sphere,
    pc_normalize,
    sphere_sqdist,
    sphere_template,
)

__all__ = [
    "H5Dataset",
    "SyntheticDataset",
    "SyntheticMultiClassDataset",
    "load_h5",
    "augment_batch",
    "jitter_batch",
    "normalize_point_cloud",
    "random_point_dropout",
    "rotate_perturbation_batch",
    "rotate_y_batch",
    "scale_batch",
    "shuffle_points_batch",
    "translate_batch",
    "masked_z",
    "sample_z",
    "prefetch_to_device",
    "fibonacci_sphere",
    "pc_normalize",
    "sphere_sqdist",
    "sphere_template",
]
