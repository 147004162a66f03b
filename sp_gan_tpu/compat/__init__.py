"""Interop with the reference PyTorch implementation: `.pth` checkpoint
ingestion for output-fidelity parity (SURVEY.md §7 hard part #6)."""

from sp_gan_tpu.compat.torch_import import (
    convert_generator,
    convert_discriminator,
    load_reference_checkpoint,
)

__all__ = ["convert_generator", "convert_discriminator",
           "load_reference_checkpoint"]
