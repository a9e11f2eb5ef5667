"""Pretrained-backbone splicing.

The reference's accuracy depends on torchvision-pretrained CNN weights
(``/root/reference/models/CrossAttnRNN21.py:61``).  Those are converted once
(scripts/convert_pretrained.py, golden-tested converters) to an ``.npz``;
``splice_backbone`` swaps the artifact into a freshly initialized variables
tree — every image encoder in the framework names its CNN subtree
``backbone``, so the splice is model-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _tree_shapes(tree):
    return {jax.tree_util.keystr(p): tuple(l.shape)
            for p, l in jax.tree_util.tree_leaves_with_path(tree)}


def _replace_backbones(node, replacement, found):
    if not hasattr(node, "items"):
        return node
    out = {}
    for k, v in node.items():
        if k == "backbone" and hasattr(v, "items"):
            want, got = _tree_shapes(v), _tree_shapes(replacement)
            if want != got:
                missing = set(want) ^ set(got)
                mismatched = {k2 for k2 in set(want) & set(got)
                              if want[k2] != got[k2]}
                raise ValueError(
                    "pretrained backbone does not match the model's backbone "
                    f"(arch/dims differ?): missing/extra={sorted(missing)[:5]} "
                    f"shape-mismatched={sorted(mismatched)[:5]}")
            out[k] = replacement
            found.append(True)
        else:
            out[k] = _replace_backbones(v, replacement, found)
    return out


def splice_backbone(variables: Dict[str, Any], backbone_variables: Dict[str, Any]):
    """Replace every ``backbone`` subtree in params (and batch_stats) with the
    converted pretrained weights; raises if no backbone exists or shapes
    mismatch."""
    found = []
    new = dict(variables)
    new["params"] = _replace_backbones(
        variables["params"], backbone_variables["params"], found)
    if variables.get("batch_stats") and backbone_variables.get("batch_stats"):
        new["batch_stats"] = _replace_backbones(
            variables["batch_stats"], backbone_variables["batch_stats"], found)
    if not found:
        raise ValueError("model has no 'backbone' subtree to splice into "
                         "(image branch ablated?)")
    return new


# --------------------------------------------------------------- npz format
# One flat npz; keys are '/'-joined paths with the collection ('params' /
# 'batch_stats') as the first segment.  scripts/convert_pretrained.py writes
# this format via these same helpers — keep the codec in one place.

def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if hasattr(v, "items"):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_backbone_npz(variables: Dict[str, Any], path: str) -> None:
    flat: Dict[str, np.ndarray] = {}
    for coll, sub in variables.items():
        flat.update(flatten_tree(sub, coll))
    np.savez_compressed(path, **flat)


def load_backbone_npz(path: str) -> Dict[str, Any]:
    """Load a converted-backbone .npz back into {'params', 'batch_stats'}."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    grouped: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in flat.items():
        coll, rest = key.split("/", 1)
        grouped.setdefault(coll, {})[rest] = v
    return {coll: unflatten_tree(sub) for coll, sub in grouped.items()}
