"""Static model configuration (replaces the reference's global tf.flags).

The reference wires ~20 structural flags through arg_scopes
(/root/reference/nets/pggan.py:24-60, pggan_utils.py:54-127). Here they are
one frozen dataclass carried by each Flax module; a new stage/resolution means
a new config + re-jit, replacing TF1 graph surgery (SURVEY.md section 7).
"""

from __future__ import annotations

import dataclasses


NORM_TYPES = ("none", "batch_norm", "instance_norm", "batch_renorm", "layer_norm")


@dataclasses.dataclass(frozen=True)
class PGGANConfig:
    """Everything static about a PGGAN generator/discriminator/encoder stack.

    One config describes one growth stage; the runner builds a sequence of
    configs with doubling ``resolution`` and alternating ``is_growing``.
    """

    resolution: int = 4               # output (and input-image) height/width
    is_growing: bool = False          # fade-in stage (PGGAN sec. 3)
    image_channels: int = 3

    # Channel schedule: min(1024 / 2**stage, max_channels).
    max_channels: int = 256
    max_channels_dis: int | None = None  # discriminator override
    # Capacity knob (not in the reference): floor the schedule so high-res
    # stages keep >= this many channels. Measured at 256px inference:
    # min_channels=64 costs ~40% throughput (the extra high-res FLOPs
    # outweigh better MXU lane utilization) — use for quality, not speed.
    min_channels: int = 0

    # Normalization (generator + encoder; discriminator uses none).
    norm_type: str = "batch_norm"     # none|batch_norm|instance_norm|batch_renorm|layer_norm
    do_pixel_norm: bool = False
    sync_batch_norm_axis: str | None = None  # mesh axis name for synced BN
    # Per-device BN statistics parity: number of batch groups (= mesh size)
    # computing independent moments; 0 = global-batch (synced) statistics.
    bn_num_groups: int = 0

    # Weight treatment.
    equalized_lr: bool = False
    spectral_norm: bool = False                  # discriminator convs/fcs
    spectral_norm_in_non_discriminator: bool = False
    init_stddev: float = 0.02

    # Fused nearest-up2+conv3x3 in the generator (ops/fused_scale.py):
    # identical function, no materialized 2x tensor; checkpoint-compatible
    # either way (the stored 3x3 kernel is unchanged). impl: dilated|parity.
    fused_scale: bool = False
    fused_scale_impl: str = "dilated"

    # Structure.
    use_res_block: bool = False
    use_larger_filter_at_rgb_layer: bool = False
    do_self_attention: bool = False
    self_attention_hw: int = 64
    # Context-parallel self-attention (SURVEY.md section 5.7): shard the
    # N = hw^2 spatial positions across the current device mesh
    # (parallel.set_current_mesh, set by StageRunner) with KV all-gather
    # over ICI — ops.sharded_attention_core. Falls back to the local path
    # when no mesh is active or the mesh has one device.
    attention_context_parallel: bool = False
    unet_max_concat_hw: int | None = None

    # Domain-adaptive norm banks (TwinGAN '_s'/'_t' postfixes). Norm params
    # and statistics are per-domain; conv/fc weights are shared.
    num_domains: int = 1

    # Conditional norms: beta/gamma produced by an FC of a style embedding
    # (MUNIT-style). 0 disables.
    style_dim: int = 0

    # Compute dtype for activations (params always fp32).
    dtype: str = "float32"

    # W8A8 int8 serving path (ops/quant.py): "" = off, "calib" = fp
    # forward that records per-conv input abs-max into the `quant`
    # collection (run a few batches with mutable=["quant"]), "int8" =
    # quantized convs using the calibrated scales. Inference-only; no
    # reference counterpart (the reference serves fp32 frozen graphs).
    quantized_inference: str = ""

    def __post_init__(self):
        if self.norm_type not in NORM_TYPES:
            raise ValueError(f"unknown norm_type {self.norm_type!r}")
        if self.resolution < 4 or self.resolution & (self.resolution - 1):
            raise ValueError("resolution must be a power of two >= 4")
        if self.is_growing and self.resolution == 4:
            raise ValueError("the 4x4 stage cannot be growing")
        if self.fused_scale_impl not in ("dilated", "parity"):
            raise ValueError(
                f"unknown fused_scale_impl {self.fused_scale_impl!r}"
            )
        if self.quantized_inference not in ("", "calib", "int8"):
            raise ValueError(
                f"unknown quantized_inference {self.quantized_inference!r}"
            )

    @property
    def max_stage(self) -> int:
        """hw=4 -> 0, hw=8 -> 1, ... (reference nets/pggan.py:126)."""
        import math

        return int(math.log2(self.resolution)) - 2

    @property
    def dis_max_channels(self) -> int:
        return self.max_channels_dis or self.max_channels

    def channels(self, stage: int, discriminator: bool = False) -> int:
        limit = self.dis_max_channels if discriminator else self.max_channels
        ch = int(min(1024 // (2**stage), limit))
        return max(ch, self.min_channels) if self.min_channels else ch

    @property
    def noise_dim(self) -> int:
        """Latent dim = channels at stage 1 (reference pggan.get_noise_shape)."""
        return self.channels(1)

    def replace(self, **kw) -> "PGGANConfig":
        return dataclasses.replace(self, **kw)
