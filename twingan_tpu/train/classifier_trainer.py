"""Multi-label image classifier trainer.

Reference parity: /root/reference/train_image_classifier.py — the trainer
used to build the illust2vec/inception taggers whose embeddings feed TwinGAN
distillation: sigmoid multi-label loss (:110-117), AUC/precision/recall eval
(:150-162), Grad-CAM visualization outputs (:184-200), tag-file output mode
(:229-287).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.struct
import optax

from twingan_tpu.models.classifiers import get_network_fn
from twingan_tpu.models.grad_cam import grad_cam, impose_mask_on_image
from twingan_tpu.train.optimizers import OptimizerConfig, build_optimizer


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    network: str = "illust2vec"
    num_classes: int = 1539
    multi_label: bool = True
    # Dropped leading label columns (reference labels_offset,
    # model_inheritor.py:213): num_classes here is ALREADY reduced; the
    # offset is persisted so eval/tags modes realign dataset labels and
    # vocabulary names with the shrunken logits layer.
    labels_offset: int = 0
    image_hw: int = 224
    batch_size: int = 32
    label_smoothing: float = 0.0
    seed: int = 0
    # Drop-path time-ramp horizon (reference total_training_steps,
    # nasnet.py:91): progress = step / total_steps ramps stochastic-depth
    # strength from 0 to the network's configured terminal value.
    total_steps: int = 250000
    opt: OptimizerConfig = dataclasses.field(
        default_factory=lambda: OptimizerConfig(optimizer="rmsprop", learning_rate=0.01,
                                                learning_rate_decay_type="exponential")
    )


@flax.struct.dataclass
class ClassifierState:
    step: jax.Array
    params: dict
    model_state: dict
    opt_state: optax.OptState


class ClassifierTrainer:
    def __init__(self, cfg: ClassifierConfig):
        import inspect

        self.cfg = cfg
        self.model = get_network_fn(cfg.network, cfg.num_classes)
        self.tx = build_optimizer(cfg.opt)
        # Only nasnet takes the drop-path progress argument.
        self._takes_progress = "progress" in inspect.signature(
            type(self.model).__call__
        ).parameters

    def init_state(self, rng: jax.Array) -> ClassifierState:
        cfg = self.cfg
        img = jnp.zeros((1, cfg.image_hw, cfg.image_hw, 3), jnp.float32)
        variables = dict(self.model.init(rng, img))
        params = variables.pop("params")
        return ClassifierState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=variables,
            opt_state=self.tx.init(params),
        )

    def _loss(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        cfg = self.cfg
        labels = labels.astype(jnp.float32)
        if cfg.label_smoothing:
            labels = labels * (1 - cfg.label_smoothing) + 0.5 * cfg.label_smoothing
        if cfg.multi_label:
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
        return jnp.mean(optax.softmax_cross_entropy(logits, labels))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: ClassifierState, batch: Dict[str, jax.Array]):
        def loss_fn(params):
            kw = {}
            if self._takes_progress:
                # Reference drop-path time ramp: step / total_training_steps
                # (nasnet_utils.py:413-421).
                kw["progress"] = state.step.astype(jnp.float32) / max(
                    self.cfg.total_steps, 1)
            out = self.model.apply(
                {"params": params, **state.model_state},
                batch["image"], train=True,
                mutable=list(state.model_state.keys()) or False,
                rngs={"drop_path": jax.random.fold_in(
                    jax.random.PRNGKey(self.cfg.seed), state.step)},
                **kw,
            )
            if state.model_state:
                (logits, eps), new_model_state = out
            else:
                (logits, eps), new_model_state = out, {}
            loss = self._loss(logits, batch["labels"])
            # Auxiliary classifier loss at weight 0.4 (reference
            # train_image_classifier.py:115-116).
            if "AuxLogits" in eps:
                loss = loss + 0.4 * self._loss(eps["AuxLogits"], batch["labels"])
            return loss, dict(new_model_state)

        (loss, new_model_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            model_state=new_model_state, opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def predict(self, state: ClassifierState, images: jax.Array) -> jax.Array:
        logits, _ = self.model.apply(
            {"params": state.params, **state.model_state}, images, train=False
        )
        return jax.nn.sigmoid(logits) if self.cfg.multi_label else jax.nn.softmax(logits)

    def embed(self, state: ClassifierState, images: jax.Array,
              layer: str = "encode") -> jax.Array:
        """Distillation embedding (reference uses the pre-logit encode layer)."""
        _, eps = self.model.apply(
            {"params": state.params, **state.model_state}, images, train=False
        )
        return eps[layer]

    # ------------------------------------------------------------------ #
    # Eval (reference :150-162)
    # ------------------------------------------------------------------ #
    def evaluate(
        self, state: ClassifierState, batches: Iterable[Dict[str, np.ndarray]],
        threshold: float = 0.5,
        pr_curve_path: Optional[str] = None,
        num_pr_thresholds: int = 21,
    ) -> Dict[str, float]:
        scores_all, labels_all = [], []
        for batch in batches:
            scores_all.append(np.asarray(self.predict(state, jnp.asarray(batch["image"]))))
            labels_all.append(np.asarray(batch["labels"]))
        scores = np.concatenate(scores_all).reshape(-1)
        labels = np.concatenate(labels_all).reshape(-1)
        pred = scores >= threshold
        tp = float(np.sum(pred & (labels > 0.5)))
        precision = tp / max(float(np.sum(pred)), 1.0)
        recall = tp / max(float(np.sum(labels > 0.5)), 1.0)
        if pr_curve_path:
            # PR-curve table over thresholds (reference streaming PR-curve
            # summaries, model_inheritor.py:752-770).
            os.makedirs(os.path.dirname(os.path.abspath(pr_curve_path)), exist_ok=True)
            with open(pr_curve_path, "w") as f:
                f.write("threshold\tprecision\trecall\n")
                for t in np.linspace(0.0, 1.0, num_pr_thresholds):
                    p_ = scores >= t
                    tp_ = float(np.sum(p_ & (labels > 0.5)))
                    f.write(f"{t:.3f}\t{tp_ / max(float(np.sum(p_)), 1.0):.6f}"
                            f"\t{tp_ / max(float(np.sum(labels > 0.5)), 1.0):.6f}\n")
        return {
            "auc": _auc(scores, labels),
            "precision_at_thres": precision,
            "recall_at_thres": recall,
        }

    # ------------------------------------------------------------------ #
    # Tag output mode (reference :229-287)
    # ------------------------------------------------------------------ #
    def write_tags(
        self,
        state: ClassifierState,
        images: np.ndarray,
        filenames: Sequence[str],
        tag_names: Sequence[str],
        out_path: str,
        threshold: float = 0.25,
        top_k: int = 10,
        labels_id_to_group: Optional[dict] = None,
    ) -> str:
        """labels_id_to_group enables the reference's mutually-exclusive
        group filter (process_mutually_exclusive_labels,
        train_image_classifier.py:218-219): only the best label per group
        survives, and nothing is written for an image unless hair AND eye
        color clear the threshold."""
        from twingan_tpu.utils.misc import process_anime_face_labels

        probs = np.asarray(self.predict(state, jnp.asarray(images)))
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "a") as f:
            for name, p in zip(filenames, probs):
                if labels_id_to_group is not None:
                    p = np.asarray(process_anime_face_labels(
                        p, threshold, labels_id_to_group))
                order = np.argsort(-p)[:top_k]
                tags = [tag_names[i] for i in order if p[i] >= threshold]
                if not tags:
                    # Reference skips images with no surviving predictions
                    # (train_image_classifier.py 'Skip empty predictions') —
                    # an empty row would pass as a labeled face downstream.
                    continue
                f.write(f"{name}\t{','.join(tags)}\n")
        return out_path

    # ------------------------------------------------------------------ #
    # Grad-CAM visualization (reference :184-200)
    # ------------------------------------------------------------------ #
    def grad_cam_images(
        self, state: ClassifierState, images: jax.Array, layer: str,
        class_index: Optional[int] = None,
    ) -> np.ndarray:
        def apply_fn(imgs, probes=None):
            return self.model.apply(
                {"params": state.params, **state.model_state}, imgs,
                train=False, probes=probes,
            )

        masks = grad_cam(apply_fn, images, layer, class_index)
        out = jax.vmap(impose_mask_on_image)(images, masks)
        return np.asarray(out)


def _auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact ROC AUC via the rank statistic (midranks for score ties, so
    saturated/duplicate scores match sklearn's tie-corrected value)."""
    pos = scores[labels > 0.5]
    neg = scores[labels <= 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return 0.5
    allscores = np.concatenate([pos, neg])
    order = np.argsort(allscores)
    sorted_scores = allscores[order]
    ranks_sorted = np.arange(1, len(allscores) + 1, dtype=np.float64)
    # Average ranks within each tied run.
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks_sorted[i : j + 1] = ranks_sorted[i : j + 1].mean()
        i = j + 1
    ranks = np.empty(len(allscores), dtype=np.float64)
    ranks[order] = ranks_sorted
    r_pos = ranks[: len(pos)].sum()
    return float((r_pos - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg)))
