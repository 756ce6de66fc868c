"""Budgeted fuzz pass in CI (the reference wires its fuzzers into the build;
here a fixed-iteration run keeps the tests deterministic)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "fuzz"))

import numpy as np


def test_fuzz_mesh_and_png_budget():
    from fuzz_targets import fuzz_mesh_once, fuzz_png_once

    rng = np.random.default_rng(1234)
    for _ in range(300):
        fuzz_mesh_once(rng)
        fuzz_png_once(rng)
