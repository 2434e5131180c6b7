"""Typed configuration system.

Re-designs the reference's ``ParamLib`` YAML-namespace loader
(``/root/reference/batch_3dmot/utils/config.py:17-98``) as typed dataclasses with
the same section layout (main / paths / resnet / pointnet / radarnet /
preprocessing / graph_construction / detections / gnn / predict / classes /
eval) so the reference's YAML profiles (``cl_config.yaml`` etc.) load directly.

Differences from the reference (deliberate fixes, see SURVEY.md §6.1):
  * class maps are normalized to 1-indexed (the reference mixes 0- and
    1-indexed maps between mini/trainval configs while one-hot encoding uses
    ``class_label - 1``; a 0-indexed map would crash);
  * the graph-artifact directory is one explicit, validated parameter
    (``paths.graphs_dir``) instead of ~6 hard-coded per-experiment path
    attributes of which the scripts reference undefined ones
    (reference ``train.py:257``, ``graph_data.py:279``);
  * CLI overrides are explicit per-field (``apply_overrides``), not a silent
    "only keys already present" merge.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List

import yaml

# The seven nuScenes tracking classes, 1-indexed to match the reference's
# trainval class map (cl_config.yaml:118-125); one-hot uses (idx - 1).
TRACKING_CLASSES: Dict[str, int] = {
    "car": 1,
    "truck": 2,
    "bus": 3,
    "trailer": 4,
    "pedestrian": 5,
    "motorcycle": 6,
    "bicycle": 7,
}

NUM_CLASSES = len(TRACKING_CLASSES)

# shared inverse map (class id -> tracking name) — single source for the
# weights/predict/detections consumers
TRACKING_CLASS_NAMES: Dict[int, str] = {
    v: k for k, v in TRACKING_CLASSES.items()
}

# nuScenes category -> tracking class (reference utils/nuscenes.py:21-44).
CATEGORY_TO_TRACKING_NAME: Dict[str, str] = {
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "vehicle.trailer": "trailer",
    "vehicle.truck": "truck",
}

# Per-class edge-score thresholds used at inference, and cluster-join
# thresholds (hard-coded twice in reference predict.py:231,301 — here once,
# overridable from config).
DEFAULT_EDGE_SCORE_THRESHOLDS: Dict[str, float] = {
    "bicycle": 0.1,
    "bus": 0.005,
    "car": 0.02,
    "motorcycle": 0.03,
    "pedestrian": 0.025,
    "trailer": 0.04,
    "truck": 0.005,
}

# Per-class relative train-split edge frequencies used for class-balanced loss
# weights (reference utils/graph_data.py:61-68).
REL_FREQ_TRAIN: Dict[str, float] = {
    "bicycle": 0.07455396870915335,
    "bus": 0.013947840246335299,
    "car": 0.44736907722651076,
    "motorcycle": 0.055813302136334404,
    "pedestrian": 0.1980141158741746,
    "trailer": 0.06407160593555014,
    "truck": 0.14623008987194142,
}


@dataclass
class MainConfig:
    project: str = "batch3dmot_tpu"
    dataset: str = "nuscenes"
    version: str = "v1.0-mini"
    class_dict: str = "nuscenes_tracking_eval"
    sensors_used: Dict[str, bool] = field(
        default_factory=lambda: {"lidar": True, "img": True, "radar": True}
    )
    detections: str = "megvii"  # 'megvii' or 'centerpoint'
    seed: int = 5621


@dataclass
class PathsConfig:
    data: str = "/data/nuscenes/"
    tmp: str = "/tmp/batch3dmot/"
    # Single validated graph-artifact directory (replaces the reference's many
    # hard-coded per-experiment path attributes).
    graphs_dir: str = ""
    models: str = ""
    eval: str = ""
    detections_dir: str = ""
    # L2 preprocessing artifacts: processed_{img,lidar,radar}_anns.json plus
    # lidar/ and radar/ per-annotation .npy dirs (the reference scatters
    # these across ~6 configured paths; one root here).
    preprocessed: str = ""
    # Optional {split: [scene names]} JSON used for split membership when
    # the nuScenes devkit is not importable (the devkit's
    # create_splits_scenes is used when present; without either, all scenes
    # land in a single 'all' split).
    splits_json: str = ""

    def finalize(self, dataset: str) -> None:
        root = os.path.join(self.tmp, dataset)
        if not self.graphs_dir:
            self.graphs_dir = os.path.join(root, "graphs")
        if not self.models:
            self.models = os.path.join(root, "models")
        if not self.eval:
            self.eval = os.path.join(root, "eval")
        if not self.detections_dir:
            self.detections_dir = os.path.join(root, "detections")
        if not self.preprocessed:
            self.preprocessed = os.path.join(root, "preprocessed")


@dataclass
class EncoderTrainConfig:
    """Shared hyperparameter shape for the three encoder trainers."""

    batch_size: int = 32
    lr: float = 1e-3
    weight_decay: float = 0.0
    beta_lo: float = 0.9
    beta_hi: float = 0.999
    scheduler_step_size: int = 20
    scheduler_gamma: float = 0.5
    num_epochs: int = 10
    checkpoint: str = ""
    manual_seed: int = 5621


@dataclass
class ResNetConfig(EncoderTrainConfig):
    batch_size: int = 32
    lr: float = 0.002
    res_size: int = 32  # crop resolution (32x32)
    ego_rad_min: float = 1.0
    ego_rad_max: float = 50.0
    latent_dim: int = 96


@dataclass
class PointNetConfig(EncoderTrainConfig):
    batch_size: int = 64
    lr: float = 0.001
    num_points: int = 128
    min_lidar_pts: int = 6
    ego_rad_min: float = 1.0
    ego_rad_max: float = 50.0
    feature_transform: bool = False


@dataclass
class RadarNetConfig(EncoderTrainConfig):
    batch_size: int = 256
    lr: float = 0.0002
    num_points: int = 64
    min_radar_pts: int = 2
    ego_rad_min: float = 1.0
    ego_rad_max: float = 50.0
    feature_transform: bool = False


@dataclass
class PreprocessingConfig:
    res_size: int = 32
    nsweeps_lidar: int = 10
    nsweeps_radar: int = 6


@dataclass
class GraphConstructionConfig:
    batch_size_graph: int = 5  # frames per sliding window
    top_knn_nodes: int = 40  # candidate predecessors per node
    feat_3d_pose_dim: int = 19
    feat_2d_app_dim: int = 32
    feat_3d_app_dim: int = 128
    feat_3d_radar_dim: int = 64
    # Padding budgets for fixed-shape device graphs (TPU-specific; absent in
    # the dynamic-shape reference). Chosen per bucket at runtime; these are
    # the hard caps.
    max_nodes: int = 512
    max_edges: int = 4096
    # Detection<->GT matching (rebuilt `match_detections`): 'center_dist'
    # (nuScenes-eval style, 2m gate) or 'iou' (BEV IoU > 0 gate).
    match_method: str = "center_dist"
    match_dist_thresh: float = 2.0
    match_iou_thresh: float = 0.0
    # Which split's detection JSON to build graphs from (reference
    # cl_config.yaml:75); v1.0-mini uses the 'mini' detection file.
    split: str = "train"
    # --synthetic scene shape (build-graphs/demo): defaults are demo-scale;
    # the trainval-scale soak (scripts/soak_trainval_scale.py) overrides to
    # 40 frames x 40 tracks. seed_base offsets the generator so train and
    # val builds produce DISJOINT scene sets.
    synthetic_frames: int = 14
    synthetic_tracks: int = 10
    synthetic_seed_base: int = 0


@dataclass
class GNNConfig:
    checkpoint: str = ""
    batch_size_graph: int = 5
    batch_size: int = 2  # windows per training batch
    lr: float = 1e-4
    weight_decay: float = 1e-4
    beta_lo: float = 0.9
    beta_hi: float = 0.999
    num_epochs: int = 100
    gnn_depth: int = 6
    edge_dim: int = 64
    node_dim: int = 19
    loss: str = "cb"  # 'cb' (class-balanced BCE) or 'bce'
    attention: bool = True
    # Replicate-or-fix flag for the reference's no-op kNN GATConv
    # (SURVEY.md §6.1-1: `x[ts == t] == x_t` discards the conv result).
    # 'noop' reproduces the trained-checkpoint behavior (conv computed but
    # discarded -> we skip computing it entirely); 'active' applies it.
    knn_conv_mode: str = "noop"
    knn_conv_k: int = 20
    manual_seed: int = 5621


@dataclass
class PredictConfig:
    checkpoint: str = ""
    batch_size_graph: int = 2
    # How many windows are scored per device batch at inference.
    windows_per_batch: int = 8
    # (--pipeline device) scenes grouped into ONE fused program dispatch —
    # amortizes the per-dispatch relay round trip (host->device transfer +
    # executable dispatch + result fetch) across the group. 1 = one
    # program per scene (round-2 behavior). Density-aware: scene groups
    # whose per-scene window grid already fills the chip (measured L=5
    # trainval regression) are automatically scored per-scene regardless
    # of this setting (infer.device_pipeline._GROUP_WORK_CEILING).
    scenes_per_batch: int = 4
    edge_score_thresholds: Dict[str, float] = field(
        default_factory=lambda: dict(DEFAULT_EDGE_SCORE_THRESHOLDS)
    )
    join_score_thresholds: Dict[str, float] = field(
        default_factory=lambda: dict(DEFAULT_EDGE_SCORE_THRESHOLDS)
    )
    interpolate_trailer_tracks: bool = True
    # Upload dtype for lidar/radar point clouds at inference. "float16"
    # (default) halves ~45% of the per-scene host->device bytes — the
    # relay-transfer wall (docs/RESULTS.md round 4) — and costs no accuracy
    # the MXU wasn't already paying (matmul operands ingest as bf16, which
    # is coarser than f16; models.encoders.points_input_f32 upcasts on
    # device). "float32" restores exact full-precision uploads.
    point_dtype: str = "float16"
    # Cached-embedding predict (--pipeline encoded): reuse the per-scene
    # frozen-encoder caches (<store>.b3d.enc.npz, digest-keyed — written by
    # --encoded training and validated against the checkpoint's encoder
    # subtree) and upload 608-d embeddings instead of raw crops+points.
    #   "auto"  (default) use the caches when EVERY store has one; else the
    #           raw-modality grouped encode (nothing written);
    #   "write" use caches, computing + persisting any that are missing or
    #           stale (first run pays per-scene encodes, re-runs are warm);
    #   "off"   always raw-modality encode on device.
    embedding_cache: str = "auto"
    # Upload dtype for cached embeddings. f16 cuts the per-detection upload
    # ~3.6x vs raw (1.2 KB vs 4.4 KB); the embeddings come from the same
    # encoders (the digest pins that), so transport rounding is the main
    # difference vs the encode-on-device path. "float32" transport is
    # bit-exact vs raw ONLY when point_dtype=float32 too: caches are built
    # from full-precision points, while the default raw path encodes
    # f16-rounded lidar/radar (~1e-5 relative residual either way).
    embedding_dtype: str = "float16"


@dataclass
class EvalConfig:
    verbose: int = 1
    eval_config: str = "tracking_nips_2019"
    eval_set: str = "val"
    render_curves: int = 0


@dataclass
class Config:
    main: MainConfig = field(default_factory=MainConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    resnet: ResNetConfig = field(default_factory=ResNetConfig)
    pointnet: PointNetConfig = field(default_factory=PointNetConfig)
    radarnet: RadarNetConfig = field(default_factory=RadarNetConfig)
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    graph_construction: GraphConstructionConfig = field(
        default_factory=GraphConstructionConfig
    )
    gnn: GNNConfig = field(default_factory=GNNConfig)
    predict: PredictConfig = field(default_factory=PredictConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    # detection-JSON paths per detector/split (reference cl_config.yaml:84-94)
    detections: Dict[str, Dict[str, str]] = field(default_factory=dict)
    classes: Dict[str, int] = field(default_factory=lambda: dict(TRACKING_CLASSES))

    def __post_init__(self) -> None:
        self.paths.finalize(self.main.dataset)
        self.validate()

    def validate(self) -> None:
        if set(self.classes.values()) != set(range(1, len(self.classes) + 1)):
            raise ValueError(
                "Class map must be 1-indexed and contiguous (got "
                f"{self.classes}); the one-hot encoding uses class_id - 1."
            )
        if self.main.detections not in ("megvii", "centerpoint"):
            raise ValueError(f"Unknown detector '{self.main.detections}'")
        if self.gnn.knn_conv_mode not in ("noop", "active"):
            raise ValueError(f"Unknown knn_conv_mode '{self.gnn.knn_conv_mode}'")
        gc = self.graph_construction
        if gc.match_method not in ("center_dist", "iou"):
            raise ValueError(f"Unknown match_method '{gc.match_method}'")
        if self.predict.point_dtype not in ("float16", "float32"):
            raise ValueError(
                f"Unknown predict.point_dtype '{self.predict.point_dtype}' "
                "(use 'float16' or 'float32')"
            )

    # ---- YAML loading -------------------------------------------------

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path, "r") as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        cfg = cls.__new__(cls)
        for f_ in dataclasses.fields(cls):
            section = raw.get(f_.name)
            default = (
                f_.default_factory()  # type: ignore[misc]
                if f_.default_factory is not dataclasses.MISSING
                else f_.default
            )
            if section is None:
                setattr(cfg, f_.name, default)
            elif dataclasses.is_dataclass(default):
                setattr(cfg, f_.name, _merge_dataclass(default, section))
            elif f_.name == "classes":
                # Accept the reference's nested form {class_dict_name: {...}}.
                if section and isinstance(next(iter(section.values())), dict):
                    name = raw.get("main", {}).get(
                        "class_dict", "nuscenes_tracking_eval"
                    )
                    section = section.get(name, next(iter(section.values())))
                setattr(cfg, f_.name, dict(section))
            else:
                setattr(cfg, f_.name, section)
        cfg.__post_init__()
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def apply_overrides(self, overrides: List[str]) -> None:
        """Apply ``section.key=value`` CLI overrides (e.g. ``gnn.lr=3e-4``)."""
        explicit = {o.split("=", 1)[0] for o in overrides if "=" in o}
        if "paths.tmp" in explicit or "main.dataset" in explicit:
            # re-derive dependent paths unless they are overridden themselves
            for leaf in (
                "graphs_dir", "models", "eval", "detections_dir", "preprocessed"
            ):
                if f"paths.{leaf}" not in explicit:
                    setattr(self.paths, leaf, "")
        for item in overrides:
            if "=" not in item:
                raise ValueError(f"Override '{item}' is not of form key=value")
            dotted, value = item.split("=", 1)
            parts = dotted.split(".")
            obj: Any = self
            for p in parts[:-1]:
                # dict sections (e.g. detections.megvii.val=...) traverse by
                # key, auto-creating intermediate maps like YAML would
                if isinstance(obj, dict):
                    obj = obj.setdefault(p, {})
                else:
                    obj = getattr(obj, p)
            leaf = parts[-1]
            if dataclasses.is_dataclass(obj):
                current = getattr(obj, leaf)
                setattr(obj, leaf, _coerce(value, current))
            elif isinstance(obj, dict):
                obj[leaf] = _coerce(value, obj.get(leaf))
            else:
                raise ValueError(f"Cannot override '{dotted}'")
        self.paths.finalize(self.main.dataset)
        self.validate()


def _merge_dataclass(instance: Any, updates: Dict[str, Any]) -> Any:
    known = {f_.name for f_ in dataclasses.fields(instance)}
    kwargs = {}
    for f_ in dataclasses.fields(instance):
        kwargs[f_.name] = getattr(instance, f_.name)
    for k, v in updates.items():
        if k in known:
            kwargs[k] = v
        # Unknown keys in user YAML are ignored (forward compatibility with
        # the reference's extra fields like 'workers', 'device', ...).
    return type(instance)(**kwargs)


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    return value


def class_one_hot_index(class_id: int) -> int:
    """1-indexed class id -> one-hot slot (reference construct...parallel.py:413-415)."""
    return class_id - 1
