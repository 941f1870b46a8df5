"""Golden-file pipeline regression — the aicp_test analog (SURVEY.md §4.1).

The reference runs 15 registrations against a fixed reference cloud and
string-compares 21 result values per line against a golden file
(aicp_core/test/aicp_test.cpp:187-265). String equality does not transfer
across float32 backends, so this harness compares numerically with explicit
tolerances (SURVEY.md §7 "numerical parity").

Regenerate after an intentional behavior change:
    python -m tests.test_golden   (writes tests/golden/pipeline_golden.json)
"""
import json
import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "pipeline_golden.json")

# tolerances per metric (units: %, %, 0-100 scale, probability, meters, -)
TOLERANCES = {
    "octree_overlap": 2.0,
    "fov_overlap": 2.0,
    "alignability": 5.0,
    "risk": 0.1,
    "correction_t": 0.02,     # translation vector, meters
    "corrected_t": 0.05,      # absolute corrected position, meters
}


def _small_cfg(**kw):
    from aicp_mapping_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig(raw_capacity=8192, downsample_capacity=4096,
                         filtered_capacity=2048, min_cluster_size=20,
                         failure_prediction_mode=False)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _run_pipeline():
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.sequence import (SequenceRunner,
                                                    synthetic_sequence)

    app = App(_small_cfg())
    items, _ = synthetic_sequence(n_frames=8, n_points=5000, seed=11)
    return SequenceRunner(app).run_clouds(items)


def _run_risk_gated():
    """failure_prediction_mode=True with the shipped real-data classifier;
    one mid-sequence frame is replaced by a degenerate corridor scan at an
    offset pose so overlap + alignability collapse -> risk > threshold ->
    registration skipped + forced reference update (app.cpp:243-245,
    401-411)."""
    import numpy as np

    from aicp_mapping_tpu.classification.classifier import RiskClassifier
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.sequence import (SequenceRunner,
                                                    synthetic_sequence)
    from aicp_mapping_tpu.tools.synthetic import corridor_cloud

    clf = RiskClassifier(threshold=0.5)
    clf.load(os.path.join(os.path.dirname(__file__), "..", "data",
                          "classification", "risk_classifier.npz"))
    cfg = _small_cfg(failure_prediction_mode=True,
                     align_ds_capacity=1024, align_max_clusters=8)
    app = App(cfg, classifier=clf)
    items, _ = synthetic_sequence(n_frames=7, n_points=5000, seed=11)
    # frame 4: unrelated degenerate corridor far from the room world
    bad = corridor_cloud(n=5000, seed=3, noise=0.01) + np.array(
        [60.0, 60.0, 0.0], np.float32)
    items[4] = (items[4][0], bad.astype(np.float32), items[4][2])
    return SequenceRunner(app).run_clouds(items)


def _run_prior_map():
    """Prior-map localization: overlap pinned at 50.0, no reference updates
    (app.cpp:54-59, 123-127)."""
    import numpy as np

    from aicp_mapping_tpu.cloud import Cloud
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.sequence import (SequenceRunner,
                                                    synthetic_sequence)

    items, _ = synthetic_sequence(n_frames=6, n_points=5000, seed=11)
    world = np.concatenate([it[1] for it in items])
    cfg = _small_cfg(localize_against_prior_map=True,
                     crop_map_around_base=20.0, map_capacity=16384)
    app = App(cfg)
    app.set_prior_map(Cloud.from_numpy(world, capacity=16384))
    return SequenceRunner(app).run_clouds(items)


def _run_go_back():
    """Mapping for 5 frames, then go_back_to_map() snapshots the built map
    and flips to localization-only (app_ros.cpp:324-357); remaining frames
    localize against it."""
    from aicp_mapping_tpu.cloud import AlignedCloud, Cloud
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.sequence import synthetic_sequence

    import numpy as np

    cfg = _small_cfg(crop_map_around_base=20.0, map_capacity=16384)
    app = App(cfg)
    items, _ = synthetic_sequence(n_frames=8, n_points=5000, seed=11)
    results = []
    for i, (utime, pts, pose) in enumerate(items):
        if i == 5:
            app.go_back_to_map()
        cloud = Cloud.from_numpy(pts, capacity=cfg.raw_capacity)
        ac = AlignedCloud.create(utime, cloud, np.asarray(pose, np.float32))
        results.append(app.process_cloud(ac))
    return results


def _result_lines(frames):
    lines = []
    for f in frames:
        lines.append({
            "reading_id": f.reading_id,
            "reference_id": f.reference_id,
            "filtered_size": f.filtered_size,
            "octree_overlap": round(f.octree_overlap, 4),
            "fov_overlap": round(f.fov_overlap, 4),
            "alignability": round(f.alignability, 4),
            "risk": round(f.risk, 4),
            "accepted": f.accepted,
            "registered": f.registered,
            "correction_t": np.asarray(f.correction)[:3, 3].tolist(),
            "corrected_t": np.asarray(f.corrected_pose)[:3, 3].tolist(),
        })
    return lines


def _compare(got, golden, scenario=""):
    assert len(got) == len(golden)
    for i, (g, e) in enumerate(zip(got, golden)):
        ctx = (scenario, i)
        assert g["reading_id"] == e["reading_id"], ctx
        assert g["reference_id"] == e["reference_id"], ctx
        assert g["accepted"] == e["accepted"], ctx
        assert g["registered"] == e["registered"], ctx
        # filtered size within 2% (prefilter bin edges may shift)
        assert abs(g["filtered_size"] - e["filtered_size"]) <= \
            max(0.02 * e["filtered_size"], 8), ctx
        for key in ("octree_overlap", "fov_overlap", "alignability", "risk"):
            if e[key] < 0:          # stage disabled in golden
                assert g[key] < 0, (*ctx, key)
            else:
                assert abs(g[key] - e[key]) <= TOLERANCES[key], \
                    (*ctx, key, g[key], e[key])
        np.testing.assert_allclose(g["correction_t"], e["correction_t"],
                                   atol=TOLERANCES["correction_t"],
                                   err_msg=f"{scenario} frame {i}")
        np.testing.assert_allclose(g["corrected_t"], e["corrected_t"],
                                   atol=TOLERANCES["corrected_t"],
                                   err_msg=f"{scenario} frame {i}")


def _load_golden():
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run `python -m tests.test_golden`")
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_pipeline_matches_golden():
    _compare(_result_lines(_run_pipeline()), _load_golden()["frames"])


def test_risk_gated_matches_golden():
    golden = _load_golden()
    got = _result_lines(_run_risk_gated())
    _compare(got, golden["risk_gated"], "risk_gated")
    # structural pin: the degenerate frame was risk-gated (registration
    # skipped -> not registered, identity correction) and forced a
    # reference update for the NEXT frame (reference_id jumps to it)
    gated = [g for g in got if not g["registered"]]
    assert len(gated) >= 1, got
    gi = got.index(gated[0])
    assert got[gi]["accepted"]
    assert np.allclose(got[gi]["correction_t"], 0.0)
    if gi + 1 < len(got):
        assert got[gi + 1]["reference_id"] == got[gi]["reading_id"]


def test_prior_map_matches_golden():
    golden = _load_golden()
    got = _result_lines(_run_prior_map())
    _compare(got, golden["prior_map"], "prior_map")
    assert all(g["octree_overlap"] == 50.0 for g in got)
    assert all(g["reference_id"] == -1 for g in got)


def test_go_back_matches_golden():
    golden = _load_golden()
    got = _result_lines(_run_go_back())
    _compare(got, golden["go_back"], "go_back")
    # after the flip, references come from the snapshotted map (-1)
    assert any(g["reference_id"] == -1 for g in got[5:])
    assert all(g["reference_id"] >= 0 for g in got[:5])


def main():
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    doc = {
        "frames": _result_lines(_run_pipeline()),
        "risk_gated": _result_lines(_run_risk_gated()),
        "prior_map": _result_lines(_run_prior_map()),
        "go_back": _result_lines(_run_go_back()),
    }
    with open(GOLDEN_PATH, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {GOLDEN_PATH} "
          f"({ {k: len(v) for k, v in doc.items()} })")


if __name__ == "__main__":
    main()
