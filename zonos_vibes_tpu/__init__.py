"""zonos-tpu: a TPU-native TTS inference framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of Zonos-v0.1
(reference: BreakTheBeta/Zonos_Vibes). See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    BackboneConfig,
    MeshConfig,
    PrefixConditionerConfig,
    RuntimeConfig,
    ZonosConfig,
)
