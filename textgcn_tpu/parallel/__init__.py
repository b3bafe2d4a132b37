from .mesh import (DATA_AXIS, MODEL_AXIS, make_mesh, param_shardings,
                   shard_model, shard_params)

__all__ = ['DATA_AXIS', 'MODEL_AXIS', 'make_mesh', 'param_shardings',
           'shard_model', 'shard_params']
