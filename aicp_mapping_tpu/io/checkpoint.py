"""Checkpoint / resume of pipeline state.

The reference has no real checkpointing — its nearest mechanisms are the
record/replay harness and the prior-map load + go-back services
(app_ros.cpp:280-357). This module adds true checkpointing (SURVEY.md §5.4):
the full `App` state — clouds graph (poses, corrections, filtered points),
total correction, aligned map, prior map, frame diagnostics — serialized to
a single compressed npz + json manifest, so a mapping session can be
suspended and resumed bit-exactly, or handed to another host.
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

CHECKPOINT_VERSION = 1


def save_checkpoint(app, path: str) -> None:
    """Serialize `App` state to `<path>.npz` + `<path>.json`.

    Finalizes any in-flight pipelined frames first: a checkpoint taken
    between submit_cloud and flush would otherwise silently drop up to
    pipeline_depth frames and serialize a speculative reference that is
    inconsistent with the saved graph."""
    from ..pipeline.app import FrameResult

    app.flush()
    arrays: dict[str, np.ndarray] = {}
    clouds_meta = []
    for i, c in enumerate(app.graph.clouds):
        arrays[f"cloud_{i}_points"] = np.asarray(c.cloud.points)
        arrays[f"cloud_{i}_mask"] = np.asarray(c.cloud.mask)
        arrays[f"cloud_{i}_poses"] = np.stack([
            np.asarray(c.odom_pose), np.asarray(c.prior_pose),
            np.asarray(c.correction), np.asarray(c.corrected_pose)])
        clouds_meta.append({
            "utime": int(c.utime),
            "is_reference": bool(c.is_reference),
            "its_reference_id": int(c.its_reference_id),
        })
    arrays["total_correction"] = np.asarray(app.total_correction)
    arrays["aligned_map"] = np.asarray(app.aligned_map_np)
    if app.prior_map is not None:
        arrays["prior_map_points"] = np.asarray(app.prior_map.points)
        arrays["prior_map_mask"] = np.asarray(app.prior_map.mask)
    if app._ref_device is not None:
        # Device-resident current reference (points, mask, normals) + pose —
        # normals came from the fused step's aligned outputs, so they must be
        # saved (not recomputed) for bit-identical resume.
        rp, rm, rn = app._ref_device
        arrays["ref_points"] = np.asarray(rp)
        arrays["ref_mask"] = np.asarray(rm)
        arrays["ref_normals"] = np.asarray(rn)
        arrays["ref_pose"] = np.asarray(app._ref_pose)

    frames = []
    for f in app.frames:
        d = dataclasses.asdict(f)
        d["correction"] = np.asarray(f.correction).tolist()
        d["corrected_pose"] = np.asarray(f.corrected_pose).tolist()
        frames.append(d)

    manifest = {
        "version": CHECKPOINT_VERSION,
        "config": dataclasses.asdict(app.cfg),
        "n_clouds": len(app.graph.clouds),
        "current_reference_id": app.graph.current_reference_id,
        "updates_counter": app.updates_counter,
        "since_ref_disp": app._since_ref_disp,
        "registered_any": app._registered_any,
        "clouds": clouds_meta,
        "frames": frames,
    }
    np.savez_compressed(path + ".npz", **arrays)
    tmp = path + ".json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, path + ".json")


def load_checkpoint(path: str, visualizer=None, classifier=None):
    """Reconstruct an `App` from a checkpoint written by `save_checkpoint`."""
    import jax.numpy as jnp

    from ..cloud import AlignedCloud, Cloud
    from ..pipeline.app import App, FrameResult
    from ..pipeline.config import PipelineConfig
    from ..registration.icp import ICPConfig

    with open(path + ".json") as f:
        manifest = json.load(f)
    if manifest["version"] != CHECKPOINT_VERSION:
        raise ValueError(f"unsupported checkpoint version {manifest['version']}")
    data = np.load(path + ".npz")

    cfg_dict = dict(manifest["config"])
    # dataclasses.asdict flattened the nested ICPConfig to a plain dict
    cfg_dict["icp"] = ICPConfig(**cfg_dict.get("icp", {}))
    cfg = PipelineConfig(**cfg_dict)
    app = App(cfg, visualizer=visualizer, classifier=classifier)
    app.total_correction = data["total_correction"]
    app._total_dev = jnp.asarray(app.total_correction)
    app.aligned_map_np = data["aligned_map"]
    if "prior_map_points" in data:
        app.prior_map = Cloud(jnp.asarray(data["prior_map_points"]),
                              jnp.asarray(data["prior_map_mask"]))
    app.updates_counter = manifest["updates_counter"]
    # Dispatch-side windowed-reference counter: older checkpoints (no key)
    # fall back to the graph-derived phase, which matches it except right
    # after a rejection/risk-forced update.
    app._since_ref_disp = manifest.get(
        "since_ref_disp",
        (manifest["n_clouds"] - (manifest["current_reference_id"] + 1))
        % max(int(cfg.reference_update_frequency), 1))
    app._registered_any = manifest.get("registered_any",
                                       manifest["n_clouds"] > 0)

    for i, meta in enumerate(manifest["clouds"]):
        poses = data[f"cloud_{i}_poses"]
        cloud = Cloud(jnp.asarray(data[f"cloud_{i}_points"]),
                      jnp.asarray(data[f"cloud_{i}_mask"]))
        ac = AlignedCloud(
            utime=meta["utime"], cloud=cloud,
            odom_pose=jnp.asarray(poses[0]),
            prior_pose=jnp.asarray(poses[1]),
            correction=jnp.asarray(poses[2]),
            corrected_pose=jnp.asarray(poses[3]),
            is_reference=meta["is_reference"],
            its_reference_id=meta["its_reference_id"])
        app.graph.add(ac)
    app.graph.current_reference_id = manifest["current_reference_id"]

    if "ref_points" in data:
        app._ref_device = (jnp.asarray(data["ref_points"]),
                           jnp.asarray(data["ref_mask"]),
                           jnp.asarray(data["ref_normals"]))
        app._ref_pose = np.asarray(data["ref_pose"], np.float32)
    elif not app.graph.is_empty():
        # older checkpoint without reference arrays: rebuild from the graph
        # reference (normals recomputed — resume is then only approximate)
        ref = app.graph.current_reference()
        from ..geometry import se3 as _se3

        normals = app._icp_normals(
            ref.cloud.points, ref.cloud.mask,
            _se3.translation(jnp.asarray(ref.corrected_pose)))
        app._ref_device = (ref.cloud.points, ref.cloud.mask, normals)
        app._ref_pose = np.asarray(ref.corrected_pose, np.float32)

    for d in manifest["frames"]:
        d["correction"] = np.asarray(d["correction"], np.float32)
        d["corrected_pose"] = np.asarray(d["corrected_pose"], np.float32)
        app.frames.append(FrameResult(**d))
    return app


# ---------------------------------------------------------------------------
# SLAM back-end (PoseGraphMapper) checkpointing — SURVEY §5.4 extended to
# the mapping session: keyframes live in the App graph (saved above with
# their is_reference flags), so the back-end state to persist is the
# verified loop-closure set + the mapper's gating parameters.
# ---------------------------------------------------------------------------

def save_mapper_checkpoint(mapper, path: str) -> None:
    """Serialize a PoseGraphMapper (App + back-end state) so a mapping
    session with loop closures can resume: `<path>.{npz,json}` for the App
    plus `<path>.mapper.json` for closures/params."""
    save_checkpoint(mapper.app, path)
    doc = {
        "version": CHECKPOINT_VERSION,
        "params": {
            "min_loop_overlap": mapper.min_loop_overlap,
            "min_keyframe_gap": mapper.min_keyframe_gap,
            "max_loop_distance": mapper.max_loop_distance,
            "odom_weight_t": mapper.odom_weight_t,
            "odom_weight_r": mapper.odom_weight_r,
        },
        "loop_closures": [
            {"i": lc.i, "j": lc.j,
             "measurement": np.asarray(lc.measurement).tolist(),
             "overlap": float(lc.overlap),
             "inlier_rms": float(lc.inlier_rms)}
            for lc in mapper.loop_closures
        ],
    }
    tmp = path + ".mapper.json.tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path + ".mapper.json")


def load_mapper_checkpoint(path: str, mesh=None, mesh_axis: str = "graph",
                           visualizer=None, classifier=None):
    """Reconstruct a PoseGraphMapper (and its App) from
    `save_mapper_checkpoint` output. The device mesh is runtime topology,
    not state — pass it explicitly when resuming on a multi-chip host."""
    from ..pipeline.mapper import LoopClosure, PoseGraphMapper

    app = load_checkpoint(path, visualizer=visualizer, classifier=classifier)
    with open(path + ".mapper.json") as f:
        doc = json.load(f)
    if doc["version"] != CHECKPOINT_VERSION:
        raise ValueError(f"unsupported mapper checkpoint {doc['version']}")
    mapper = PoseGraphMapper(app, mesh=mesh, mesh_axis=mesh_axis,
                             **doc["params"])
    mapper.loop_closures = [
        LoopClosure(i=lc["i"], j=lc["j"],
                    measurement=np.asarray(lc["measurement"], np.float32),
                    overlap=lc["overlap"], inlier_rms=lc["inlier_rms"])
        for lc in doc["loop_closures"]
    ]
    return mapper
