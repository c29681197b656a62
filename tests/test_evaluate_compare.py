"""evaluate.py third-party comparison hook: externally produced TUM
trajectories are tabulated side-by-side against the same groundtruth
(reference parity for utils/tools/py/evaluate.py:125-235, whose
docker-run ORB-SLAM3/stella baselines cannot run here)."""

import json
import os

import numpy as np

from modular_slam_tpu.eval.evaluate import (_comparison_trajectory,
                                            _load_tum_trajectory,
                                            evaluate_datasets)


def test_load_tum_trajectory(tmp_path):
    p = tmp_path / "traj.txt"
    p.write_text("# header\n"
                 "0.0 1 2 3 0 0 0 1\n"
                 "\n"
                 "0.1 1.1 2 3 0 0 0 1 extra_col\n")
    t = _load_tum_trajectory(str(p))
    assert t.shape == (2, 8)
    np.testing.assert_allclose(t[1, 1], 1.1)


def test_comparison_trajectory_resolution(tmp_path):
    d = tmp_path / "runs"
    d.mkdir()
    (d / "seq1.txt").write_text("0 0 0 0 0 0 0 1\n")
    assert _comparison_trajectory(str(d), "seq1", 2) is not None
    assert _comparison_trajectory(str(d), "seq2", 2) is None
    f = tmp_path / "one.txt"
    f.write_text("0 0 0 0 0 0 0 1\n")
    assert _comparison_trajectory(str(f), "anything", 1) == str(f)
    assert _comparison_trajectory(str(f), "anything", 2) is None


def test_compare_in_report(tmp_path):
    sample = os.path.join(os.path.dirname(__file__), "..", "data", "sample")
    assert os.path.isdir(sample)
    # "external" trajectory = the groundtruth itself -> ATE ~ 0
    gt = np.loadtxt(os.path.join(sample, "groundtruth.txt"))
    ext = tmp_path / "perfect.txt"
    np.savetxt(ext, gt[:, :8])

    out = tmp_path / "report"
    report = evaluate_datasets(
        [sample], str(out), pipeline="odometry", max_frames=6,
        compare={"perfect": str(ext)})
    seq = report["sequences"]["sample"]
    assert "compare" in seq, seq
    assert seq["compare"]["perfect"] < 1e-6
    csv = (out / "ate.csv").read_text()
    assert "sample:perfect" in csv
