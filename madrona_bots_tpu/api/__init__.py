from madrona_bots_tpu.api.manager import SimManager, Tensor

__all__ = ["SimManager", "Tensor"]
