"""Interop with the reference PyTorch implementation: `.pth` checkpoint
ingestion for output-fidelity parity (SURVEY.md §7 hard part #6), the
reverse export of checkpoints trained here back to reference-format
`.pth`, plus the FPD extractor's DGCNN weight key-map."""

from sp_gan_tpu.compat.torch_export import (
    export_discriminator,
    export_generator,
    save_reference_checkpoint,
)
from sp_gan_tpu.compat.torch_import import (
    convert_dgcnn,
    convert_discriminator,
    convert_generator,
    load_dgcnn_weights,
    load_reference_checkpoint,
)

__all__ = ["convert_generator", "convert_discriminator",
           "load_reference_checkpoint", "convert_dgcnn",
           "load_dgcnn_weights", "export_generator",
           "export_discriminator", "save_reference_checkpoint"]
