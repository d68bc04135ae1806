"""sav_tpu: a TPU-native self-attention vision framework.

A from-scratch JAX / XLA / Pallas rebuild of the capability surface of
NZ99/self-attention-experiments-vision: a seven-architecture vision model zoo
(ViT, CaiT, CeiT, CvT, TNT, BoTNet, MLP-Mixer) over a shared layer library,
a string-keyed ``create_model`` factory, an on-device deterministic input
pipeline, and mesh-sharded data-parallel training.
"""

from sav_tpu.models import (BoTNet, CaiT, CeiT, CvT, MLPMixer, TNT, ViT,
                            available_models, create_model)

__version__ = '0.1.0'

__all__ = ['BoTNet', 'CaiT', 'CeiT', 'CvT', 'MLPMixer', 'TNT', 'ViT',
           'create_model', 'available_models', '__version__']
