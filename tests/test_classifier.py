import numpy as np
import pytest

from aicp_mapping_tpu.classification import RiskClassifier, load_label_file


def synthetic_labels(n=400, seed=0):
    """Risk is high when overlap and alignability are both low — the
    qualitative structure of the reference's labelled sets
    (data/labels/*.txt: id overlap alignability label)."""
    rng = np.random.default_rng(seed)
    overlap = rng.uniform(0, 100, n)
    align = rng.uniform(0, 30, n)
    score = overlap / 100.0 + align / 30.0
    labels = (score < 0.8).astype(np.float32)  # failure when poorly constrained
    feats = np.stack([overlap, align], axis=1).astype(np.float32)
    return feats, labels


def test_train_and_separate():
    X, y = synthetic_labels()
    clf = RiskClassifier(threshold=0.5)
    clf.train(X, y, steps=2000)
    probs, stats = clf.test(X, y)
    assert stats["accuracy"] > 0.95, stats
    # risky sample (low overlap + low alignability) scores high
    p_risky = float(np.asarray(clf.test(np.array([[5.0, 1.0]]))))
    p_safe = float(np.asarray(clf.test(np.array([[90.0, 25.0]]))))
    assert p_risky > 0.8
    assert p_safe < 0.2


def test_save_load_roundtrip(tmp_path):
    X, y = synthetic_labels(200, seed=1)
    clf = RiskClassifier()
    clf.train(X, y, steps=1000)
    p1 = np.asarray(clf.test(X[:10]))
    path = str(tmp_path / "svm_model.npz")
    clf.save(path)
    clf2 = RiskClassifier()
    clf2.load(path)
    p2 = np.asarray(clf2.test(X[:10]))
    np.testing.assert_allclose(p1, p2, rtol=1e-6)


def test_real_data_beats_reference_svm():
    """Train on the reference's real labelled experiment logs and evaluate on
    its held-out test set (aicp_core/data/labels/*.txt). The pinned floors
    are set just below the measured result (AUC 0.987, best-F1 0.904); the
    reference's own SVM scores AUC 0.964 / best-F1 0.836 on this set
    (probs_27Aug.txt scored by the same harness), so these floors certify
    we at least match it."""
    import os

    from aicp_mapping_tpu.eval.analysis import f_scores, roc_curve

    root = os.path.join(os.path.dirname(__file__), "..", "data", "labels")
    ftr, ltr = load_label_file(
        os.path.join(root, "training_all_labelled_1Sep.txt"))
    fte, lte = load_label_file(
        os.path.join(root, "testing_labelled_27Aug.txt"))
    assert len(ltr) > 1000 and len(lte) > 200

    clf = RiskClassifier(threshold=0.5)
    clf.train(ftr, ltr)
    probs = np.asarray(clf.test(fte)).reshape(-1)
    auc, _, _ = roc_curve(probs, lte)
    _, best_f1, _, _ = f_scores(probs, lte)
    assert auc >= 0.975, auc          # reference SVM: 0.964
    assert best_f1 >= 0.87, best_f1   # reference SVM: 0.836


def test_shipped_default_model_matches_eval():
    """The checked-in default asset (data/classification/risk_classifier.npz)
    was trained on the real data; its test-set AUC must match the checked-in
    eval_real.json record."""
    import json
    import os

    from aicp_mapping_tpu.eval.analysis import roc_curve

    root = os.path.join(os.path.dirname(__file__), "..", "data")
    clf = RiskClassifier()
    clf.load(os.path.join(root, "classification", "risk_classifier.npz"))
    fte, lte = load_label_file(
        os.path.join(root, "labels", "testing_labelled_27Aug.txt"))
    probs = np.asarray(clf.test(fte)).reshape(-1)
    auc, _, _ = roc_curve(probs, lte)
    with open(os.path.join(root, "classification", "eval_real.json")) as f:
        recorded = json.load(f)
    np.testing.assert_allclose(auc, recorded["auc"], atol=1e-3)


def test_label_file_parsing(tmp_path):
    # the reference's data/labels format: id overlap alignability label
    p = tmp_path / "labels.txt"
    p.write_text("0 76.67 0.124 0\n1 73.20 0.131 0 \n2 12.1 0.05 1\n")
    X, y = load_label_file(str(p))
    assert X.shape == (3, 2)
    # alignability is scaled x100 on load to match the runtime feature
    # (classification/main.cpp:124)
    np.testing.assert_allclose(X[0], [76.67, 12.4], rtol=1e-5)
    np.testing.assert_array_equal(y, [0, 0, 1])


def test_pretrained_model_set_loads_and_performs():
    """The shipped per-operating-point pretrained classifiers (the analog
    of the reference's multiple svm_*training_thresh*.xml assets,
    aicp_core/data/classification/) all load and clear an AUC floor on the
    real held-out test set."""
    import json
    import os

    import numpy as np

    from aicp_mapping_tpu.classification.classifier import (RiskClassifier,
                                                            load_label_file)

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "data", "classification",
                           "pretrained_models.json")) as f:
        manifest = json.load(f)
    assert len(manifest) >= 3
    feats, labels = load_label_file(
        os.path.join(root, "data", "labels", "testing_labelled_27Aug.txt"))
    thresholds = set()
    for name, meta in manifest.items():
        clf = RiskClassifier()
        clf.load(os.path.join(root, "data", "classification", name + ".npz"))
        thresholds.add(clf.threshold)
        probs, stats = clf.test(feats, labels)
        p = np.asarray(probs)
        lab = np.asarray(labels) > 0.5
        ths = np.linspace(0, 1, 101)
        tpr = [(p[lab] >= t).mean() for t in ths]
        fpr = [(p[~lab] >= t).mean() for t in ths]
        auc = float(np.trapezoid(tpr[::-1], fpr[::-1]))
        assert auc > 0.95, (name, auc)
        assert stats["accuracy"] > 0.85, (name, stats)
    # genuinely distinct operating points, not copies
    assert len(thresholds) >= 3
