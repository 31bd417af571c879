from madrona_bots_tpu.viz.viewer import ScriptBotsViewer

__all__ = ["ScriptBotsViewer"]
