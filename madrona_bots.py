"""Compatibility shim: `import madrona_bots` like the reference module.

The reference builds a nanobind extension named `madrona_bots`
(src/entry/entry.cpp:12) that learn/ imports (training_loop.py:8). This shim
lets that import style work against the TPU framework unchanged:

    from madrona_bots import SimManager, ScriptBotsViewer
"""

from madrona_bots_tpu.api.manager import SimManager, Tensor
from madrona_bots_tpu.viz.viewer import ScriptBotsViewer

__all__ = ["SimManager", "ScriptBotsViewer", "Tensor"]
