from sav_tpu.utils.metrics import topk_correct

__all__ = ['topk_correct']
