"""Every demo runs end-to-end for a few steps (SURVEY §4: the reference uses
demos AS its integration tests). ``TFG_DEMO_SMOKE_STEPS`` caps each training
loop (demo_utils.demo_steps) so the whole sweep stays CI-sized; the demos
keep their full convergence behavior when run directly.
"""
import glob
import os
import runpy
import sys

import pytest

DEMO_DIR = os.path.join(os.path.dirname(__file__), "..", "demo")
DEMO_FILES = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(DEMO_DIR, "demo_*.py"))
    if os.path.basename(p) != "demo_utils.py")


def test_all_demos_enumerated():
    """Reference parity: 29 upstream demos + device-sampling + hetero-rgcn."""
    assert len(DEMO_FILES) == 31


@pytest.mark.parametrize("demo_file", DEMO_FILES)
def test_demo_smoke(demo_file, monkeypatch, tmp_path):
    monkeypatch.setenv("TFG_DEMO_SMOKE_STEPS", "2")
    # keep dataset downloads (which fail offline into the synthetic fallback)
    # out of the user's real cache dir
    monkeypatch.setenv("TFG_TPU_DATA_ROOT", str(tmp_path))
    monkeypatch.syspath_prepend(DEMO_DIR)
    mod = runpy.run_path(os.path.join(DEMO_DIR, demo_file))
    result = mod["main"]()
    assert result is not None
