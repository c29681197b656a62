"""Shim: the prewarmer lives in the package (modular_slam_tpu/prewarm.py,
console script `mslam-prewarm`) so installed deployments can warm the
persistent compile cache without a repo checkout."""
import sys

sys.path.insert(0, ".")

from modular_slam_tpu.prewarm import main

if __name__ == "__main__":
    raise SystemExit(main())
