"""Pure-function kernel library (the JAX/Pallas equivalent of reference libs/).

Reference parity map:
- basic.py      <- libs/gdrop.py, nets/pggan_utils.py (pixel norm, equalized
                   lr scaling, minibatch stddev, up/downsample),
                   util_misc.fp16_friendly_leaky_relu
- norms.py      <- libs/batch_norm.py, libs/instance_norm.py
- sn.py         <- libs/sn.py (spectral norm power iteration)
- attention.py  <- libs/self_attention.py (SAGAN self attention)
- msssim.py     <- libs/ms_ssim.py
- swd.py        <- tf.contrib.gan sliced wasserstein (image_generation.py SWD eval)
"""

from twingan_tpu.ops.basic import (
    leaky_relu,
    pixel_norm,
    upsample_nearest_2x,
    avg_pool_2x,
    box_downsample_2x,
    minibatch_stddev,
    gdrop,
    equalized_lr_scale,
    local_response_norm,
    blend,
    num_channels,
    resize_bilinear,
)
from twingan_tpu.ops.norms import (
    moments,
    normalize,
    batch_renorm_correction,
    renorm_clipping_schedule,
)
from twingan_tpu.ops.fused_scale import up2_conv, up2_conv_kernel
from twingan_tpu.ops.sn import spectral_normalize, power_iteration
from twingan_tpu.ops.attention import self_attention, sharded_attention_core
from twingan_tpu.ops.msssim import ssim, msssim
from twingan_tpu.ops.swd import sliced_wasserstein_distance
