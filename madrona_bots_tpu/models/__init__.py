from madrona_bots_tpu.models.generator import SpeciesNetGenerator
from madrona_bots_tpu.models.actor_critic import ActorCritic

__all__ = ["SpeciesNetGenerator", "ActorCritic"]
