"""Configuration for the AICP pipeline.

Typed replacement of the reference's three-layer config system
(SURVEY.md §5.6): `CommandLineConfig` + Registration/Overlap/Classification
param structs (app.hpp:24-46, aicp_registration/common.hpp:7-23,
aicp_overlap/common.hpp:7-16, aicp_classification/common.hpp:38-50), parsed
from the same AICP YAML schema (yaml_configurator.cpp:9-108,
config/aicp_config.yaml). The ICP chain itself is configured by
`registration.ICPConfig`; the per-frame trim-ratio auto-tune is a traced
runtime parameter, not a YAML rewrite (design delta, SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
import os

from ..registration.icp import ICPConfig


@dataclasses.dataclass
class PipelineConfig:
    # --- CommandLineConfig analog (app.hpp:24-46, aicp_ros_node.cpp:46-100) ---
    working_mode: str = "robot"            # "robot" | "debug" (sim correction)
    failure_prediction_mode: bool = False
    reference_update_frequency: int = 5    # aicp_ros_node.cpp:27
    max_correction_magnitude: float = 0.5  # meters/axis, aicp_ros_node.cpp:28
    crop_map_around_base: float = 8.0
    load_map_from_file: bool = False
    localize_against_prior_map: bool = False
    localize_against_built_map: bool = False
    merge_aligned_clouds_to_map: bool = False
    verbose: bool = False
    debug_dir: str = ""                    # dump per-frame PCDs like the
                                           # reference's /tmp/aicp_data
                                           # (app.cpp:19-29, 339-350)

    # --- RegistrationParams (aicp_registration/common.hpp:7-23) ---
    sensor_range: float = 100.0            # aicp_config.yaml:4
    sensor_angular_view: float = 360.0     # aicp_config.yaml:5
    load_poses_from: str = ""
    initial_transform: str = ""

    # --- OverlapParams (aicp_overlap/common.hpp:7-16) ---
    octree_resolution: float = 0.2         # aicp_config.yaml:21

    # --- ClassificationParams (aicp_classification/common.hpp:38-50) ---
    risk_threshold: float = 0.50           # aicp_config.yaml:28
    classifier_path: str = ""              # saved RiskClassifier .npz
    # Direct occupancy-overlap gate (0 = off): a frame whose octree overlap
    # falls below this percentage takes the SAME skip-registration +
    # forced-reference-update path as a high classifier risk
    # (app.cpp:243-245, 401-411). The classifier's two features are
    # (overlap, alignability) trained on the reference platform's
    # distribution; this gate gives deployments on other sensor/scene
    # distributions the first feature's protection without retraining —
    # e.g. re-anchoring after a sensor outage longer than the sensor range.
    min_overlap_percent: float = 0.0

    # --- pre-filter (filteringUtils.cpp:5-45) ---
    voxel_size: float = 0.08
    prefilter_normal_k: int = 30
    graph_k: int = 15
    smoothness_deg: float = 3.0
    min_cluster_size: int = 50
    # "hough": gather-free radius normals + (normal, offset) plane binning —
    #   fastest on TPU, tuned for indoor/short-range scans where a fixed
    #   normals radius and offset resolution hold.
    # "region_growing": kNN normals + bounded-iteration label propagation —
    #   the reference's own connectivity semantics (PCL RegionGrowing,
    #   filteringUtils.cpp:25-36); density-independent, required at outdoor
    #   ranges where fixed-radius neighborhoods go empty and plane-offset
    #   bins fragment (lever arm |p| amplifies normal noise).
    segmentation_method: str = "hough"
    normal_radius: float = 0.4             # hough-method moments radius

    # Streaming pipeline depth for App.submit_cloud: how many frames may be
    # in flight before a (batched) finalize. 1 = each frame's host sync
    # overlaps the next frame's compute; K>1 additionally amortizes the
    # host round-trip over K frames (one batched device_get per K frames —
    # decisive on a remote-tunneled chip where every sync has a ~25 ms
    # floor). Gates/graph bookkeeping lag up to K frames, the same latency
    # model as the reference's worker thread vs its sensor stream
    # (app_ros.cpp:68-149). process_cloud always runs depth-0 (synchronous).
    pipeline_depth: int = 4

    # --- ICP chain (icp_autotuned.yaml) ---
    icp: ICPConfig = dataclasses.field(default_factory=ICPConfig)
    icp_normal_k: int = 20                 # SurfaceNormalDataPointsFilter knn
    trim_ratio_floor: float = 0.25         # auto-tune clamp (app.cpp:198-202);
    trim_ratio_ceil: float = 0.70          # raise the floor without odometry

    # --- static capacities (TPU shape budget; powers of two for tiling) ---
    raw_capacity: int = 131072
    downsample_capacity: int = 32768
    filtered_capacity: int = 8192
    map_capacity: int = 262144

    # --- wire format for per-frame cloud uploads (streaming drivers) ---
    # On a tunneled chip the H2D transfer serializes with device compute,
    # so wire bytes directly cost throughput (768 KB/frame = ~6 ms idle
    # device; see Cloud.from_numpy). quantized_upload sends int16
    # fixed-point (half the bytes, ~2.5 mm step at 160 m span — below lidar
    # noise). wire_voxel > 0 additionally voxel-downsamples each cloud on
    # the HOST (native C++) to `downsample_capacity` before upload — the
    # device voxel stage is idempotent on an already-voxelized cloud, so
    # pipeline semantics are preserved up to grid-phase effects; the
    # accumulator's crop+batch is host-side in the reference too
    # (velodyne_accumulator.cpp:58-67). Both default OFF: goldens and
    # accuracy regressions run the exact raw path.
    quantized_upload: bool = False
    wire_voxel: float = 0.0
    # Finalize in-flight frames on a dedicated thread instead of blocking
    # the dispatch thread in the batched device_get (which on the tunneled
    # runtime acts as a full queue sync). The dispatch thread then never
    # stalls and throughput reaches the device-bound rate; results surface
    # via App.drain_results() / flush(). Same staleness model as
    # pipeline_depth; the reference's callback/worker split is the exact
    # analog (app_ros.cpp:223-254).
    async_finalize: bool = False

    # --- alignability ---
    align_ds_capacity: int = 4096
    align_max_clusters: int = 32


def _parse_icp_dict(icp: dict, base: ICPConfig) -> ICPConfig:
    return dataclasses.replace(
        base,
        max_iterations=int(icp.get("maxIterationCount", base.max_iterations)),
        min_diff_trans=float(icp.get("minDiffTransErr", base.min_diff_trans)),
        min_diff_rot=float(icp.get("minDiffRotErr", base.min_diff_rot)),
        smooth_length=int(icp.get("smoothLength", base.smooth_length)),
        error_metric=str(icp.get("errorMetric", base.error_metric)),
        max_match_dist=float(icp.get("maxDist", base.max_match_dist)),
        trim_ratio=float(icp.get("trimRatio", base.trim_ratio)),
    )


def load_icp_chain_yaml(path: str, base: ICPConfig | None = None):
    """Parse one named ICP-chain YAML (configs/icp/*.yaml — the rebuild's
    analog of the reference's libpointmatcher chain files,
    aicp_core/config/icp/*.yaml) into (ICPConfig, reading ChainFilterConfig,
    reference ChainFilterConfig)."""
    import yaml

    from ..registration.chain import ChainFilterConfig

    path = os.path.expandvars(os.path.expanduser(path))
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    aicp = doc.get("AICP", doc)
    icp = aicp.get("ICP", {}) or {}
    cfg = _parse_icp_dict(icp, base or ICPConfig())

    def _filters(d: dict) -> ChainFilterConfig:
        return ChainFilterConfig(
            min_dist=float(d.get("minDist", 0.0)),
            max_dist=float(d.get("maxDist", 0.0)),
            random_sampling_prob=float(d.get("randomSamplingProb", 1.0)),
            max_density_cell=float(d.get("maxDensityCell", 0.0)),
        )

    reading = _filters(icp.get("readingFilters", {}) or {})
    reference = _filters(icp.get("referenceFilters", {}) or {})
    return cfg, reading, reference


def load_yaml_config(path: str, base: PipelineConfig | None = None) -> PipelineConfig:
    """Parse the reference AICP YAML schema into a PipelineConfig."""
    import yaml

    cfg = dataclasses.replace(base) if base else PipelineConfig()
    # env-var expansion in the config path (fileIO.cpp:215-232 semantics)
    path = os.path.expandvars(os.path.expanduser(path))
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    aicp = doc.get("AICP", doc)

    reg = aicp.get("Registration", {}) or {}
    cfg.sensor_range = float(reg.get("sensorRange", cfg.sensor_range))
    cfg.sensor_angular_view = float(
        reg.get("sensorAngularView", cfg.sensor_angular_view))
    cfg.load_poses_from = str(reg.get("loadPosesFrom", cfg.load_poses_from) or "")
    cfg.initial_transform = str(
        reg.get("initialTransform", cfg.initial_transform) or "")

    ovl = aicp.get("Overlap", {}) or {}
    ob = ovl.get("OctreeBased", {}) or {}
    cfg.octree_resolution = float(
        ob.get("octomapResolution", cfg.octree_resolution))

    cls = aicp.get("Classifier", {}) or {}
    svm = cls.get("SVM", {}) or {}
    cfg.risk_threshold = float(svm.get("threshold", cfg.risk_threshold))
    cfg.classifier_path = str(svm.get("saveFile", cfg.classifier_path) or "")

    # --- extensions over the reference schema ---------------------------
    # ICP chain parameters live inline (the reference points at a separate
    # libpointmatcher YAML via Registration.configFile; here the solver is
    # typed, so the chain is a plain sub-dict)
    icp = aicp.get("ICP", {}) or {}
    if icp:
        cfg.icp = _parse_icp_dict(icp, cfg.icp)
    pipe = aicp.get("Pipeline", {}) or {}
    for yaml_key, attr in (
            ("workingMode", "working_mode"),
            ("failurePredictionMode", "failure_prediction_mode"),
            ("referenceUpdateFrequency", "reference_update_frequency"),
            ("maxCorrectionMagnitude", "max_correction_magnitude"),
            ("cropMapAroundBase", "crop_map_around_base"),
            ("localizeAgainstPriorMap", "localize_against_prior_map"),
            ("localizeAgainstBuiltMap", "localize_against_built_map"),
            ("mergeAlignedCloudsToMap", "merge_aligned_clouds_to_map"),
            ("rawCapacity", "raw_capacity"),
            ("downsampleCapacity", "downsample_capacity"),
            ("filteredCapacity", "filtered_capacity"),
            ("mapCapacity", "map_capacity"),
            ("voxelSize", "voxel_size"),
            ("minClusterSize", "min_cluster_size"),
            ("segmentationMethod", "segmentation_method"),
            ("normalRadius", "normal_radius"),
    ):
        if yaml_key in pipe:
            cur = getattr(cfg, attr)
            setattr(cfg, attr, type(cur)(pipe[yaml_key]))
    return cfg
