"""Model zoo: seven vision architectures plus the string-keyed factory.

Mirrors the reference export surface (reference: models/__init__.py:1-8).
"""

from sav_tpu.models.botnet import BoTNet
from sav_tpu.models.cait import CaiT
from sav_tpu.models.ceit import CeiT
from sav_tpu.models.cvt import CvT
from sav_tpu.models.factory import (MODEL_CONFIGS, available_models,
                                    create_model)
from sav_tpu.models.mlp_mixer import MLPMixer
from sav_tpu.models.tnt import TNT
from sav_tpu.models.vit import ViT

__all__ = ['BoTNet', 'CaiT', 'CeiT', 'CvT', 'MLPMixer', 'TNT', 'ViT',
           'create_model', 'available_models', 'MODEL_CONFIGS']
