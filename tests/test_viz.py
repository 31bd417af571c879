"""Viewer / renderer smoke tests (headless Agg backend)."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np


def test_save_frame(tmp_path):
    from madrona_bots_tpu.api.manager import SimManager
    from madrona_bots_tpu.viz.render import save_frame
    mgr = SimManager(0, 1, 3, 16)
    mgr.step()
    path = save_frame(mgr.state, 0, mgr.cfg, str(tmp_path / "frame.png"))
    assert os.path.exists(path) and os.path.getsize(path) > 5000


def test_viewer_headless_loop(tmp_path):
    from madrona_bots_tpu.viz import ScriptBotsViewer
    viewer = ScriptBotsViewer(0, 1, 5, 16, frame_dir=str(tmp_path / "frames"),
                              frame_every=2)
    mgr = viewer.get_sim_mgr()
    steps = []

    def step_fn(epoch, carry):
        mgr.step()
        steps.append(epoch)

    viewer.loop(4, step_fn, None)
    assert steps == [1, 2, 3, 4]
    frames = os.listdir(tmp_path / "frames")
    assert len(frames) >= 2


def test_semantic_palette():
    from madrona_bots_tpu.viz.render import semantic_to_rgb
    sem = np.array([-1, 0, 1, 2, 3, 4], np.int8)
    rgb = semantic_to_rgb(sem)
    assert rgb.shape == (6, 3)
    # distinct colors for distinct codes
    assert len({tuple(r) for r in rgb.round(3)}) == 6


def test_stdin_test_driver():
    """Drive the interactive test driver through a pipe (test.cpp parity)."""
    import subprocess
    import sys
    proc = subprocess.run(
        [sys.executable, "-m", "madrona_bots_tpu.tools.test_driver"],
        input="w\nr\nq\n", capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": os.path.dirname(os.path.dirname(
                 os.path.abspath(__file__)))},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines()
             if l and l[0].isdigit() or (l and l.startswith("0"))]
    # two steps -> two depth printouts of 32 bytes each
    depth_lines = [l for l in proc.stdout.splitlines()
                   if len(l.split()) == 32]
    assert len(depth_lines) == 2
    assert proc.stdout.strip().endswith("bye")
