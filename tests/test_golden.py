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


def _run_pipeline():
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.config import PipelineConfig
    from aicp_mapping_tpu.pipeline.sequence import (SequenceRunner,
                                                    synthetic_sequence)

    cfg = PipelineConfig(raw_capacity=8192, downsample_capacity=4096,
                         filtered_capacity=2048, min_cluster_size=20,
                         failure_prediction_mode=False)
    app = App(cfg)
    items, _ = synthetic_sequence(n_frames=8, n_points=5000, seed=11)
    return SequenceRunner(app).run_clouds(items)


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


def test_pipeline_matches_golden():
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run `python -m tests.test_golden`")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = _result_lines(_run_pipeline())
    assert len(got) == len(golden["frames"])
    for i, (g, e) in enumerate(zip(got, golden["frames"])):
        assert g["reading_id"] == e["reading_id"], i
        assert g["reference_id"] == e["reference_id"], i
        assert g["accepted"] == e["accepted"], i
        assert g["registered"] == e["registered"], i
        # filtered size within 2% (prefilter bin edges may shift)
        assert abs(g["filtered_size"] - e["filtered_size"]) <= \
            max(0.02 * e["filtered_size"], 8), i
        for key in ("octree_overlap", "fov_overlap", "alignability", "risk"):
            if e[key] < 0:          # stage disabled in golden
                assert g[key] < 0, (i, key)
            else:
                assert abs(g[key] - e[key]) <= TOLERANCES[key], (i, key, g[key], e[key])
        np.testing.assert_allclose(g["correction_t"], e["correction_t"],
                                   atol=TOLERANCES["correction_t"],
                                   err_msg=f"frame {i}")
        np.testing.assert_allclose(g["corrected_t"], e["corrected_t"],
                                   atol=TOLERANCES["corrected_t"],
                                   err_msg=f"frame {i}")


def main():
    frames = _run_pipeline()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump({"frames": _result_lines(frames)}, f, indent=1)
    print(f"wrote {GOLDEN_PATH} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
