"""GAN objectives and penalties (reference: `/root/reference/Common/loss_utils.py`)."""

from sp_gan_tpu.losses.gan import gen_loss, dis_loss, mix_loss
from sp_gan_tpu.losses.gp import r1_penalty, wgan_gp
from sp_gan_tpu.losses.cutmix import cutmix
from sp_gan_tpu.losses.shape_preserving import shape_preserving_loss
from sp_gan_tpu.losses.point_aux import (repulsion_loss, uniform_loss,
                                         uniform_loss_knn)

__all__ = ["gen_loss", "dis_loss", "mix_loss", "r1_penalty", "wgan_gp",
           "cutmix", "shape_preserving_loss", "repulsion_loss", "uniform_loss",
           "uniform_loss_knn"]
