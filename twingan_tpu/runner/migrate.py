"""Cross-stage checkpoint migration: the pytree replacement for name-matched
``ignore_missing_vars`` restore (reference pggan_runner.py:136-146,
model_inheritor._get_init_fn :576-644).

When the resolution doubles, the new stage's freshly-initialized state is a
strict superset of the previous stage's (growth-stable layer names,
models/pggan.py): migrating = copy every leaf whose path AND shape match,
keep fresh init elsewhere (the new block/to_rgb/from_rgb layers and their
optimizer slots — matching the reference's implicit fresh-init of unmatched
variables). Counters (step / critic_step / EMAs) reset to the template's
zeros, mirroring 'the global step restarts from 0 for every stage'
(reference nets/pggan_utils.py:43).
"""

from __future__ import annotations

from typing import Any

import numpy as np

# State-dict paths that must NOT carry across stages (fresh counters).
RESET_PATHS = ("step", "critic_step", "gen_loss_ema", "gdrop_strength")


def _flatten(tree: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
        return out
    return {prefix: tree}


def _unflatten_into(template: Any, flat: dict[tuple, Any], prefix: tuple = ()) -> Any:
    if isinstance(template, dict):
        return {
            k: _unflatten_into(v, flat, prefix + (str(k),)) for k, v in template.items()
        }
    return flat.get(prefix, template)


def migrate_state_dict(
    template: dict,
    restored: dict,
    reset_paths: tuple = RESET_PATHS,
    strict_unused: bool = False,
    exclude_scopes: tuple = (),
) -> tuple[dict, dict]:
    """Copy restored leaves into the template wherever path+shape intersect.

    Returns (migrated_state_dict, report) where report lists
    carried / fresh / dropped / shape-mismatch paths for logging (the
    reference logs nothing here, which made growth bugs invisible).
    """
    flat_t = _flatten(template)
    flat_r = _flatten(restored)
    report = {"carried": [], "fresh": [], "dropped": [], "shape_mismatch": []}
    out = dict(flat_t)
    for path, tval in flat_t.items():
        joined = "/".join(path)
        if any(p in reset_paths for p in path[:1]):
            report["fresh"].append(joined)
            continue
        if exclude_scopes and any(
            joined.startswith(scope) or any(p == scope for p in path)
            for scope in exclude_scopes
        ):
            # checkpoint_exclude_scopes: PREFIX match like the reference
            # (model_inheritor.py:617 var.op.name.startswith), plus exact
            # path-segment match so a bare layer name excludes that layer
            # anywhere — never bare substring (a scope 'conv0' must not
            # swallow every 'block_*_conv0' leaf).
            report["fresh"].append(joined)
            continue
        rval = flat_r.get(path)
        if rval is None:
            report["fresh"].append("/".join(path))
            continue
        t_shape = np.shape(tval)
        r_shape = np.shape(rval)
        if t_shape != r_shape:
            report["shape_mismatch"].append(f"{'/'.join(path)}: {r_shape} -> {t_shape}")
            continue
        out[path] = rval
        report["carried"].append("/".join(path))
    for path in flat_r:
        if path not in flat_t:
            report["dropped"].append("/".join(path))
    if strict_unused and report["dropped"]:
        raise ValueError(f"restored leaves with no destination: {report['dropped'][:10]}")
    return _unflatten_into(template, out), report
