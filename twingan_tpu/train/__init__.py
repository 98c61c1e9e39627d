"""Training framework: loss library, optimizers, jitted train steps.

Reference parity map:
- losses.py     <- image_generation.py add_gan_loss/_add_wgan_gp_loss/
                   _add_dragan_loss (:317-476)
- optimizers.py <- model_inheritor.py _configure_optimizer/_configure_learning_rate
                   (:471-565)
- state.py      <- the TF1 global-step / n_critic_counter / gdrop-EMA
                   variables (image_generation.py:563-651)
- gan_trainer.py  <- image_generation.py GanModel (plain generation)
- twingan_trainer.py <- twingan.py GanModel (dual-domain translation)
"""

from twingan_tpu.train.losses import GanLossConfig, generator_gan_loss, discriminator_gan_loss, gradient_penalty
from twingan_tpu.train.optimizers import OptimizerConfig, build_optimizer
