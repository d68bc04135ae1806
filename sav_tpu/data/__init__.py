from sav_tpu.data import color, constants, image_ops, mix, preprocess
from sav_tpu.data.pipeline import (AugmentConfig, AugmentedArrayDataset,
                                   create_dataset, make_train_augment_fn,
                                   parse_augment_name)
from sav_tpu.data.randaugment import RandAugment
from sav_tpu.data.synthetic import SyntheticDataset, synthetic_batch

__all__ = ['constants', 'image_ops', 'mix', 'preprocess', 'AugmentConfig',
           'AugmentedArrayDataset', 'create_dataset',
           'make_train_augment_fn', 'parse_augment_name', 'RandAugment',
           'SyntheticDataset', 'synthetic_batch']
