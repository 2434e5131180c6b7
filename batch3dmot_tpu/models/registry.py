"""Named model family registry — the reference's model-module namespace.

The reference's ``predict.py:33-40`` imports a family of model modules, most
of which are MISSING from the public snapshot (SURVEY.md §0): ``clr_att_gnn``
(in-repo, the paper's full model), ``cl_att_gnn`` (what predict.py actually
instantiates: camera+lidar), ``cl_gnn_trad``, ``gnn_baseline``,
``gnn_transfer_cl`` / ``gnn_transfer_cl_med``, plus the in-repo ``pose_gnn``.

This registry reconstructs the family from the graduated knobs of the two
implemented architectures. Mappings for the missing modules are INFERRED
from their names and call sites:

  * ``cl_att_gnn``      — camera+lidar with cross-edge attention (radar
    dropped; the dims shrink accordingly, exactly how the in-repo model
    guards absent modalities);
  * ``cl_gnn_trad``     — camera+lidar, "traditional" concat fusion instead
    of the attention block (``use_attention=False`` — the in-repo file's
    ``use_attention`` flag is precisely this ablation switch,
    ``clr_att_gnn.py:17,143-164``);
  * ``gnn_baseline``    — the no-sensor baseline: poses-only graph network
    (PoseGNN topology);
  * ``gnn_transfer_cl`` / ``_med`` — architecturally ``cl_att_gnn``;
    "transfer" names a *training regimen* (encoder transfer), not a model
    shape, so they share the constructor.
"""

from __future__ import annotations

from typing import Callable, Dict

from batch3dmot_tpu.models.gnn import MultimodalGNN, PoseGNN


def _mm(modalities, use_attention=True):
    def make(depth: int = 6, knn_conv_mode: str = "noop", **kw):
        return MultimodalGNN(
            depth=depth,
            use_attention=use_attention,
            knn_conv_mode=knn_conv_mode,
            modalities=modalities,
            **kw,
        )

    return make


def _pose():
    def make(depth: int = 6, knn_conv_mode: str = "noop", **kw):
        return PoseGNN(depth=depth, knn_conv_mode=knn_conv_mode, **kw)

    return make


MODEL_REGISTRY: Dict[str, Callable] = {
    # canonical names
    "clr_att_gnn": _mm(("img", "lidar", "radar")),
    "cl_att_gnn": _mm(("img", "lidar")),
    "cl_gnn_trad": _mm(("img", "lidar"), use_attention=False),
    "gnn_transfer_cl": _mm(("img", "lidar")),
    "gnn_transfer_cl_med": _mm(("img", "lidar")),
    "gnn_baseline": _pose(),
    "pose_gnn": _pose(),
    # this framework's short aliases
    "mm": _mm(("img", "lidar", "radar")),
    "pose": _pose(),
}


def make_model(name: str, depth: int = 6, knn_conv_mode: str = "noop", **kw):
    """Instantiate a registered model family by reference or alias name."""
    try:
        ctor = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model '{name}'; choose from {sorted(MODEL_REGISTRY)}"
        ) from None
    return ctor(depth=depth, knn_conv_mode=knn_conv_mode, **kw)
