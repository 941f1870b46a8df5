"""Drive the full AICP pipeline over a drifting synthetic sequence on TPU."""
import time
import numpy as np
import jax
print("backend:", jax.default_backend())
from aicp_mapping_tpu.pipeline import App, PipelineConfig, SequenceRunner, synthetic_sequence
from aicp_mapping_tpu.classification import RiskClassifier
from aicp_mapping_tpu.utils.visualizer import RecordingVisualizer

cfg = PipelineConfig(working_mode="debug", raw_capacity=16384,
                     downsample_capacity=8192, filtered_capacity=4096,
                     map_capacity=65536, align_ds_capacity=2048,
                     align_max_clusters=16, min_cluster_size=30,
                     failure_prediction_mode=True)
# train a classifier on synthetic risk data so the failure-prediction path runs
rng = np.random.default_rng(0)
ov = rng.uniform(0, 100, 300); al = rng.uniform(0, 30, 300)
y = ((ov < 12) & (al < 3)).astype(np.float32)  # risk only when both features collapse
clf = RiskClassifier(0.5); clf.train(np.stack([ov, al], 1), y, steps=1500)

items, gt = synthetic_sequence(n_frames=12, n_points=10000, seed=1)
vis = RecordingVisualizer()
app = App(cfg, visualizer=vis, classifier=clf)
runner = SequenceRunner(app)

t0 = time.time()
frames = runner.run_clouds(items[:2])   # compile frame
t_compile = time.time() - t0
t0 = time.time()
frames += runner.run_clouds(items[2:])
t_rest = time.time() - t0

odom_err = [float(np.linalg.norm(it[2][:3,3]-g[:3,3])) for it, g in zip(items, gt)]
corr_err = [float(np.linalg.norm(f.corrected_pose[:3,3]-g[:3,3])) for f, g in zip(frames, gt)]
print(f"frames={len(frames)} accepted={sum(f.accepted for f in frames)} "
      f"registered={sum(f.registered for f in frames)}")
print(f"final odom drift={odom_err[-1]*100:.1f}cm -> corrected={corr_err[-1]*100:.1f}cm")
print(f"overlap range: {min(f.octree_overlap for f in frames[1:]):.0f}-{max(f.octree_overlap for f in frames[1:]):.0f}%")
print(f"alignability range: {min(f.alignability for f in frames[1:]):.1f}-{max(f.alignability for f in frames[1:]):.1f}")
print(f"risk range: {min(f.risk for f in frames[1:]):.2f}-{max(f.risk for f in frames[1:]):.2f}")
print(f"compile(2 frames)={t_compile:.0f}s, then {len(items)-2} frames in {t_rest:.1f}s "
      f"= {(len(items)-2)/t_rest:.1f} frames/s")
print("timing:", {k: f"{v['mean_ms']:.0f}ms" for k, v in app.timing.summary().items()})
assert corr_err[-1] < odom_err[-1] + 0.01  # improves on odometry (posegraph tightens further)
assert sum(f.accepted for f in frames) == len(frames)
print("OK")
