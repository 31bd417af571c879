"""Viewer smoke test — parity with learn/app.py (reference app.py:1-20):
open the viewer on 1 world / 16 agents and step the sim each frame.

Run: python -m madrona_bots_tpu.learn.app [--num_epochs N]
"""

from __future__ import annotations

import argparse

from madrona_bots_tpu.viz import ScriptBotsViewer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_worlds", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    viewer = ScriptBotsViewer(0, args.num_worlds, args.seed, 16)
    sim_mgr = viewer.get_sim_mgr()

    def step_fn(epoch, carry):
        sim_mgr.step()

    viewer.loop(args.num_epochs, step_fn, None)


if __name__ == "__main__":
    main()
