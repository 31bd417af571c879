"""Interactive stdin test driver — parity with the reference's only native
test (src/entry/test.cpp:4-88, built as `madrona_bots_test`).

One world, 16 agents. Characters map to agent 0's action exactly like the
reference (test.cpp:41-66): w=forward, s=backward, r=rotate left,
f=rotate right, SPACE=shoot, b=breed, q=quit. After each step the 32 depth
bytes of agent 0's sensor are printed (test.cpp:77-85).

Run:  python -m madrona_bots_tpu.tools.test_driver
"""

from __future__ import annotations

import sys

import numpy as np

from madrona_bots_tpu.api.manager import SimManager


def main(argv=None):
    mgr = SimManager(0, 1, 0, 16)
    print("madrona_bots_tpu test driver: w/s/r/f/<space>/b + Enter to act, "
          "q to quit")
    for line in sys.stdin:
        line = line.rstrip("\n")
        if line == "q":
            break
        keys = set(line)
        offset = mgr.agent_offset_for_world(0)
        sensor_idx = mgr.sensor_index_tensor().to_numpy()
        row = int(sensor_idx[offset, 0])
        mgr.set_action(row,
                       forward=int("w" in keys), backward=int("s" in keys),
                       rotate_left=int("r" in keys),
                       rotate_right=int("f" in keys),
                       shoot=int(" " in keys), breed=int("b" in keys))
        mgr.step()
        sensor_idx = mgr.sensor_index_tensor().to_numpy()
        row = int(sensor_idx[mgr.agent_offset_for_world(0), 0])
        depth = mgr.depth_tensor(False).to_numpy()[row]
        print(" ".join(str(int(d)) for d in depth))
    print("bye")


if __name__ == "__main__":
    main()
