"""Functional compute tier: pure-array ops and Pallas TPU kernels."""

from sav_tpu.ops.attention import (attention_weights, head_mix,
                                   multi_head_attention)

__all__ = ['attention_weights', 'head_mix', 'multi_head_attention']
