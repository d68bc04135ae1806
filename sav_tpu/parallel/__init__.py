from sav_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                   create_mesh, param_shardings, param_spec,
                                   replicated)

__all__ = ['DATA_AXIS', 'MODEL_AXIS', 'batch_sharding', 'create_mesh',
           'param_shardings', 'param_spec', 'replicated']
