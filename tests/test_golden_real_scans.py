"""Full-App regression on the reference's REAL sensor scans.

The reference's own regression drives the complete pipeline (filter ->
overlap -> alignability -> risk -> auto-tuned ICP) over real clouds and
compares result lines against a golden file
(aicp_core/test/aicp_test.cpp:51-57, 156-265 — its dataset is external and
not shipped). The repo-shipped real data is the three planar-lidar scans
`aicp_core/data/scan_00..02.csv`; this harness runs the FULL App over them —
as a 3-frame sequence against a fixed reference (the aicp_test pattern:
clouds 1..N vs cloud_0) and as all pairwise registrations — with every
stage live: hough prefilter, voxel-occupancy overlap, FOV overlap,
alignability, the real-data-trained risk classifier, the auto-tuned trimmed
ICP, and both gates.

The 2D scans are lifted to 2.5D by extruding along z (walls become vertical
plane strips) so the 3D pipeline's plane segmentation / alignability have
real structure to work on — the standard lift for feeding planar lidar to a
3D pipeline; x/y geometry is untouched real sensor data.

Regenerate after an intentional behavior change:
    python -m tests.test_golden_real_scans
"""
import json
import os

import numpy as np
import pytest

from tests.test_golden import TOLERANCES, _compare, _result_lines

REFERENCE_DATA = "/root/reference/aicp_core/data"
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "real_scans_golden.json")
_HAVE_DATA = os.path.isdir(REFERENCE_DATA)


def _load_scan(name: str) -> np.ndarray:
    """Real planar scan -> 2.5D cloud: z-extrusion over a 0.6 m band."""
    from aicp_mapping_tpu.io.planar import read_planar_csv

    pts2 = read_planar_csv(os.path.join(REFERENCE_DATA, name))
    assert pts2.shape[0] > 2000, name   # real scan, not a stub
    levels = np.linspace(-0.3, 0.3, 9, dtype=np.float32)
    n = pts2.shape[0]
    out = np.empty((n * len(levels), 3), np.float32)
    for i, z in enumerate(levels):
        out[i * n:(i + 1) * n, :2] = pts2
        out[i * n:(i + 1) * n, 2] = z
    return out


def _cfg():
    from aicp_mapping_tpu.pipeline.config import PipelineConfig

    return PipelineConfig(
        raw_capacity=32768, downsample_capacity=8192,
        filtered_capacity=4096, min_cluster_size=20,
        failure_prediction_mode=True,
        align_ds_capacity=1024, align_max_clusters=16,
        max_correction_magnitude=1.0,
        sensor_range=30.0,
        # all frames register against scan_00 (aicp_test.cpp:156 registers
        # clouds 1..15 against the fixed cloud_0)
        reference_update_frequency=100)


def _classifier():
    from aicp_mapping_tpu.classification.classifier import RiskClassifier

    clf = RiskClassifier(threshold=0.5)
    clf.load(os.path.join(os.path.dirname(__file__), "..", "data",
                          "classification", "risk_classifier.npz"))
    return clf


def _run_sequence():
    """3-frame sequence: scan_01 and scan_02 register against scan_00."""
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.sequence import SequenceRunner

    app = App(_cfg(), classifier=_classifier())
    items = [(i * 1_000_000, _load_scan(f"scan_0{i}.csv"),
              np.eye(4, dtype=np.float32)) for i in range(3)]
    return SequenceRunner(app).run_clouds(items)


def _run_pairwise():
    """All ordered pairs (ref, reading) through a fresh App each — the
    registration-CLI pattern (registration_main.cpp:366-478)."""
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.sequence import SequenceRunner

    scans = {i: _load_scan(f"scan_0{i}.csv") for i in range(3)}
    out = {}
    for a, b in [(0, 1), (0, 2), (1, 2)]:
        app = App(_cfg(), classifier=_classifier())
        items = [(0, scans[a], np.eye(4, dtype=np.float32)),
                 (1_000_000, scans[b], np.eye(4, dtype=np.float32))]
        res = SequenceRunner(app).run_clouds(items)
        out[f"{a}_{b}"] = res[1:]      # drop the bootstrap frame
    return out


def _load_golden():
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run `python -m tests.test_golden_real_scans`")
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.skipif(not _HAVE_DATA, reason="reference dataset not present")
def test_real_scan_sequence_matches_golden():
    got = _result_lines(_run_sequence())
    _compare(got, _load_golden()["sequence"], "real_sequence")
    # structural pins: every non-bootstrap frame ran the full risk stage on
    # real data and registered against scan_00
    for g in got[1:]:
        assert g["registered"], g
        assert g["accepted"], g
        assert g["reference_id"] == 0, g
        assert 0.0 <= g["octree_overlap"] <= 100.0
        assert 0.0 <= g["fov_overlap"] <= 100.0
        assert 0.0 <= g["alignability"] <= 100.0
        assert 0.0 <= g["risk"] <= 1.0


@pytest.mark.skipif(not _HAVE_DATA, reason="reference dataset not present")
def test_real_scan_pairwise_matches_golden():
    golden = _load_golden()["pairwise"]
    got = {k: _result_lines(v) for k, v in _run_pairwise().items()}
    assert set(got) == set(golden)
    for key in got:
        _compare(got[key], golden[key], f"real_pair_{key}")


@pytest.mark.skipif(not _HAVE_DATA, reason="reference dataset not present")
def test_real_scan_pairwise_consistency():
    """Cross-check without golden: the chained corrections 0->1 and 1->2
    must approximately compose to 0->2 (the scans are three views of one
    scene), and each pairwise correction must be consistent between the
    sequence run and the pairwise run."""
    pair = {k: v[0] for k, v in _run_pairwise().items()}
    T01 = np.asarray(pair["0_1"].correction, np.float64)
    T02 = np.asarray(pair["0_2"].correction, np.float64)
    T12 = np.asarray(pair["1_2"].correction, np.float64)
    # reading->reference: scan2 -> scan1 -> scan0 vs scan2 -> scan0
    comp = T01 @ T12
    err = np.linalg.inv(T02) @ comp
    t_err = np.linalg.norm(err[:3, 3])
    ang = np.degrees(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                       -1.0, 1.0)))
    assert t_err < 0.10, (t_err, err)
    assert ang < 2.0, ang


def main():
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    doc = {
        "sequence": _result_lines(_run_sequence()),
        "pairwise": {k: _result_lines(v)
                     for k, v in _run_pairwise().items()},
    }
    with open(GOLDEN_PATH, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {GOLDEN_PATH}")
    for line in doc["sequence"]:
        print("seq ", line)
    for k, v in doc["pairwise"].items():
        print(k, v)


if __name__ == "__main__":
    main()
