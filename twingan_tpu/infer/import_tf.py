"""Best-effort importer for reference TF1 TwinGAN checkpoints.

The BASELINE fidelity gate wants the reference's pretrained human->anime
model reproduced through our inference contract (BASELINE.md). The
pretrained checkpoints are external downloads that cannot be fetched in this
offline environment, so this importer is validated structurally (name-mapping
unit tests) and ships a remap report for iterating on a real checkpoint.

TF1 variable naming (from the reference's scopes + slim defaults):
    encoder_content/from_rgb_256x256/Conv/weights
    encoder_content/encoder_block_128x128x256/Conv_1/BatchNorm/beta_s
    generator/block_8x8x256/Conv/weights
    generator/generator_to_rgb_256x256/Conv/weights
    discriminator_t/before_fc_1x1x256/Conv_1/biases
    discriminator_t/prediction/fully_connected/weights
Slim conv scopes inside a block are Conv, Conv_1, ...; norms live under
<conv scope>/BatchNorm with the '_s'/'_t' domain postfix on each param
(libs/batch_norm.py:130,153). Weight layouts match directly: conv HWIO,
fc [in, out].

Known divergence: for models trained with use_larger_filter_at_rgb_layer,
the growing-stage prev to_rgb kernel here is min(7, (hw/2)/2) (growth-stable
weight sharing) while the reference builds min(7, hw/2) at that point
(nets/pggan.py:173-178) — such checkpoints surface as shape_mismatch entries
in the report rather than importing silently wrong.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

# TF norm param -> our DomainNorm param stem.
_NORM_PARAMS = {
    "beta": "beta",
    "gamma": "gamma",
    "moving_mean": "moving_mean",
    "moving_variance": "moving_var",
    "renorm_mean": "renorm_mean",
    "renorm_mean_weight": "renorm_mean_weight",
    "renorm_stddev": "renorm_stddev",
    "renorm_stddev_weight": "renorm_stddev_weight",
}

_SCOPE_TO_NET = {
    "encoder_content": "encoder_content",
    "encoder_style": "encoder_style",
    "generator": "generator",
    "discriminator_s": "discriminator_s",
    "discriminator_t": "discriminator_t",
    "discriminator": "discriminator",
}


def _split_domain(name: str) -> Tuple[str, int]:
    """'beta_s' -> ('beta', 0); 'gamma_t' -> ('gamma', 1); 'beta' -> ('beta', 0)."""
    if name.endswith("_s"):
        return name[:-2], 0
    if name.endswith("_t"):
        return name[:-2], 1
    return name, 0


def map_var_name(tf_name: str) -> Optional[Tuple[str, tuple, Optional[str]]]:
    """TF1 variable name -> (network key, our param path, collection).

    ``collection`` is None for trainable params, 'batch_stats' for norm
    moving statistics, 'spectral' for the power-iteration ``u`` vectors.
    Returns None for unmapped names (optimizer slots, counters, ...).
    """
    tf_name = tf_name.split(":")[0]
    parts = tf_name.split("/")
    if parts[0] not in _SCOPE_TO_NET:
        return None
    net = _SCOPE_TO_NET[parts[0]]
    rest = parts[1:]
    if not rest:
        return None
    # Skip optimizer slot variables (.../Adam, .../RMSProp etc.).
    if rest[-1] in ("Adam", "Adam_1", "RMSProp", "RMSProp_1", "Momentum"):
        return None

    block = rest[0]
    leaf = rest[-1]

    # Self-attention module (reference pggan_utils.py:301-308 scope
    # 'self_attention_<hw>x<hw>x<c>' containing sa_f/sa_g/sa_h sn-convs and
    # the sa_gamma scalar from libs/self_attention.py:24-70).
    m = re.match(r"self_attention_(\d+)x\d+x\d+$", block)
    if m:
        layer = f"self_attention_{m.group(1)}"
        if leaf == "sa_gamma":
            return net, (layer, "sa_gamma"), None
        if len(rest) >= 2 and rest[1] in ("sa_f", "sa_g", "sa_h"):
            if leaf == "weights":
                return net, (layer, rest[1], "conv", "kernel"), None
            if leaf == "biases":
                return net, (layer, rest[1], "conv", "bias"), None
            if leaf == "u":
                return net, (layer, rest[1], "conv", "u"), "spectral"
            # The sa convs sit inside the surrounding arg scope, so they
            # carry the norm too (BatchNorm/InstanceNorm sub-scope).
            if any(p in ("BatchNorm", "InstanceNorm") for p in rest[2:]):
                stem, domain = _split_domain(leaf)
                if stem in _NORM_PARAMS:
                    ours = f"{_NORM_PARAMS[stem]}_{domain}"
                    collection = (
                        "batch_stats"
                        if stem.startswith(("moving", "renorm")) else None
                    )
                    return net, (layer, rest[1], "norm", ours), collection
        return None

    # Scope name -> our layer prefix.
    m = re.match(r"(?:encoder_)?block_(\d+)x\d+(?:x\d+)?$", block)
    if m:
        layer = f"block_{m.group(1)}"
    else:
        m = re.match(r"(?:generator_)?to_rgb_(\d+)x\d+$", block)
        if m:
            layer = f"to_rgb_{m.group(1)}"
        else:
            m = re.match(r"from_rgb_(\d+)x\d+$", block)
            if m:
                layer = f"from_rgb_{m.group(1)}"
            else:
                m = re.match(r"before_fc_1x1x\d+$", block)
                if m:
                    layer = "before_fc"
                elif block == "prediction":
                    # prediction/fully_connected/{weights,biases,u}
                    if leaf == "weights":
                        return net, ("prediction", "kernel"), None
                    if leaf == "biases":
                        return net, ("prediction", "bias"), None
                    if leaf == "u":
                        return net, ("prediction", "u"), "spectral"
                    return None
                else:
                    return None

    # Resblock shortcut 1x1 conv (reference pggan_utils.py:334-342, scope
    # 'shortcut' inside the block scope; ours lives under <layer>_res).
    # from_rgb blocks carry one too (maybe_resblock in
    # discriminator/encoder from_rgb, nets/pggan.py:230,392) — without
    # this gate their shortcut weights would fall through to the Conv
    # scan and silently overwrite the from_rgb conv kernel.
    if "shortcut" in rest[1:] and layer.startswith(("block_", "from_rgb_")):
        if leaf == "weights":
            return net, (f"{layer}_res", "shortcut", "conv", "kernel"), None
        if leaf == "biases":
            return net, (f"{layer}_res", "shortcut", "conv", "bias"), None
        if leaf == "u":
            return net, (f"{layer}_res", "shortcut", "conv", "u"), "spectral"
        return None

    # Conv index inside the block: Conv -> conv0, Conv_1 -> conv1.
    conv_idx = 0
    norm_tail = None
    for p in rest[1:]:
        cm = re.match(r"Conv(?:_(\d+))?$", p)
        if cm:
            conv_idx = int(cm.group(1) or 0)
        elif p in ("BatchNorm", "InstanceNorm"):
            norm_tail = "norm"

    if layer.startswith(("to_rgb", "from_rgb")):
        layer_name = layer if layer.startswith("to_rgb") else f"{layer}_conv"
    else:
        layer_name = f"{layer}_conv{conv_idx}"

    if leaf == "weights":
        return net, (layer_name, "conv", "kernel"), None
    if leaf == "biases":
        return net, (layer_name, "conv", "bias"), None
    if leaf == "u":
        return net, (layer_name, "conv", "u"), "spectral"
    stem, domain = _split_domain(leaf)
    if stem in _NORM_PARAMS and norm_tail:
        ours = f"{_NORM_PARAMS[stem]}_{domain}"
        collection = "batch_stats" if stem.startswith(("moving", "renorm")) else None
        return net, (layer_name, "norm", ours), collection
    return None


def import_tf_checkpoint(ckpt_path: str, state, strict: bool = False):
    """Load a reference TF checkpoint into a GanTrainState.

    Returns (new_state, report) with report['mapped'/'unmapped'/
    'missing_target'/'shape_mismatch']. Requires TensorFlow for the reader.
    """
    import tensorflow as tf
    import flax.serialization

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    sd = flax.serialization.to_state_dict(state)
    report = {
        "mapped": [], "unmapped": [], "unmapped_in_scope": [],
        "missing_target": [], "shape_mismatch": [],
    }
    _slot_suffixes = ("Adam", "Adam_1", "RMSProp", "RMSProp_1", "Momentum",
                      "ExponentialMovingAverage", "biased", "local_step")

    for tf_name in sorted(shapes):
        mapped = map_var_name(tf_name)
        if mapped is None:
            scope = tf_name.split("/")[0]
            leaf = tf_name.split(":")[0].split("/")[-1]
            if scope in _SCOPE_TO_NET and leaf not in _slot_suffixes:
                # A model variable from a network scope we claim to map —
                # silent fresh-init here would corrupt a fidelity import.
                report["unmapped_in_scope"].append(tf_name)
            else:
                report["unmapped"].append(tf_name)
            continue
        net, path, collection = mapped
        root = sd["params" if collection is None else "model_state"]
        cursor = root.get(net)
        if cursor is not None and collection is not None:
            cursor = cursor.get(collection)
        for key in path[:-1]:
            if cursor is None:
                break
            cursor = cursor.get(key)
        if cursor is None or path[-1] not in cursor:
            report["missing_target"].append(f"{tf_name} -> {net}/{'/'.join(path)}")
            continue
        value = np.asarray(reader.get_tensor(tf_name))
        target_shape = tuple(np.shape(cursor[path[-1]]))
        if target_shape != value.shape:
            squeezed = tuple(d for d in value.shape if d != 1)
            target_squeezed = tuple(d for d in target_shape if d != 1)
            if squeezed == target_squeezed:
                # Rank-only difference, e.g. the spectral-norm u: TF keeps
                # [1, out], we keep [out]. Anything with genuinely different
                # dims (equal element count included — a channel-schedule
                # divergence) must surface as shape_mismatch, not import
                # silently-wrong weights.
                value = value.reshape(target_shape)
            else:
                report["shape_mismatch"].append(
                    f"{tf_name}: {value.shape} -> {target_shape}"
                )
                continue
        cursor[path[-1]] = value
        report["mapped"].append(tf_name)

    if strict and (report["missing_target"] or report["shape_mismatch"]
                   or report["unmapped_in_scope"]):
        raise ValueError(f"import incomplete: {report}")
    return flax.serialization.from_state_dict(state, sd), report
