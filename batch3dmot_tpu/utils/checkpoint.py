"""Checkpoint save/load.

Replaces per-epoch ``torch.save(state_dict)`` with metric-stamped filenames
(reference ``train.py:217-226``) by orbax-backed checkpoints plus a
lightweight msgpack path for single-file artifacts. The composition pattern
is preserved: frozen encoder checkpoints are loaded *into* the tracker's
parameter tree (reference ``train.py:54-61``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, variables: Any, metadata: Optional[Dict] = None) -> str:
    """Serialize a flax variable collection (params/batch_stats/...) to one
    msgpack file; metadata goes to a sidecar JSON."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    variables = jax.device_get(variables)
    # atomic via rename: a kill mid-save must never leave a truncated
    # msgpack at the final path a later resume would trust
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(variables))
    os.replace(tmp, path)
    if metadata is not None:
        meta_tmp = f"{path}.meta.json.tmp.{os.getpid()}"
        with open(meta_tmp, "w") as f:
            json.dump(metadata, f)
        os.replace(meta_tmp, path + ".meta.json")
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Load a checkpoint into the structure of ``target`` (a template
    variable collection from ``model.init``).

    The tree is placed on the default device in ONE batched transfer:
    ``from_bytes`` returns host numpy leaves, and since the inference
    programs take weights as jit *arguments* (docs/KERNELS.md), numpy
    leaves would otherwise be re-uploaded through the TPU relay on every
    scorer call."""
    import jax

    with open(path, "rb") as f:
        data = f.read()
    return jax.device_put(serialization.from_bytes(target, data))


def epoch_checkpoint_name(
    log_dir: str, prefix: str, epoch: int, version: str, train_ap: float, val_ap: float
) -> str:
    """Metric-stamped per-epoch checkpoint path (the reference embeds
    Train/Val AP in the filename, train.py:219-226)."""
    return os.path.join(
        log_dir,
        f"{prefix}_epoch{epoch}_{version}_TrainAP{train_ap:.6f}_ValAP{val_ap:.6f}.msgpack",
    )


def merge_encoder_params(
    gnn_variables: Dict[str, Any],
    resnet: Optional[Dict[str, Any]] = None,
    pointnet: Optional[Dict[str, Any]] = None,
    radarnet: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Graft separately-trained encoder variables into the GNN's tree under
    their submodule names (resnet / pointnet / radarnet)."""
    out = jax.tree.map(lambda x: x, gnn_variables)  # shallow-ish copy
    for name, enc in (("resnet", resnet), ("pointnet", pointnet), ("radarnet", radarnet)):
        if enc is None:
            continue
        for coll, tree in enc.items():
            if coll not in out:
                out[coll] = {}
            out[coll] = dict(out[coll])
            out[coll][name] = tree
    return out
