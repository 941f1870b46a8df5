"""Checkpoint/resume: a resumed App must continue a sequence identically to
an uninterrupted run."""
import numpy as np

from aicp_mapping_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from aicp_mapping_tpu.pipeline.app import App
from aicp_mapping_tpu.pipeline.config import PipelineConfig
from aicp_mapping_tpu.pipeline.sequence import SequenceRunner, synthetic_sequence


def _cfg():
    return PipelineConfig(raw_capacity=8192, downsample_capacity=4096,
                          filtered_capacity=2048, min_cluster_size=20)


def test_checkpoint_resume_identical(tmp_path):
    items, _ = synthetic_sequence(n_frames=6, n_points=4000, seed=5)

    # uninterrupted run
    app_full = App(_cfg())
    full = SequenceRunner(app_full).run_clouds(items)

    # run 3 frames, checkpoint, resume, run the rest
    app_a = App(_cfg())
    SequenceRunner(app_a).run_clouds(items[:3])
    ckpt = str(tmp_path / "state")
    save_checkpoint(app_a, ckpt)

    app_b = load_checkpoint(ckpt)
    assert app_b.graph.n_clouds == app_a.graph.n_clouds
    assert app_b.graph.current_reference_id == app_a.graph.current_reference_id
    np.testing.assert_array_equal(app_b.total_correction,
                                  app_a.total_correction)
    assert len(app_b.frames) == len(app_a.frames)

    resumed = SequenceRunner(app_b).run_clouds(items[3:])

    # resumed tail must match the uninterrupted run exactly
    tail = full[3:]
    assert len(resumed) == len(tail)
    for r, t in zip(resumed, tail):
        assert r.accepted == t.accepted
        assert r.registered == t.registered
        np.testing.assert_allclose(r.correction, t.correction, atol=1e-5)
        np.testing.assert_allclose(r.corrected_pose, t.corrected_pose,
                                   atol=1e-5)


def test_checkpoint_preserves_prior_map(tmp_path):
    from aicp_mapping_tpu.cloud import Cloud
    from aicp_mapping_tpu.tools.synthetic import room_cloud

    app = App(_cfg())
    app.set_prior_map(Cloud.from_numpy(room_cloud(n=2000, seed=1),
                                       capacity=4096))
    ckpt = str(tmp_path / "s2")
    save_checkpoint(app, ckpt)
    app2 = load_checkpoint(ckpt)
    assert app2.prior_map is not None
    np.testing.assert_array_equal(np.asarray(app2.prior_map.points),
                                  np.asarray(app.prior_map.points))
