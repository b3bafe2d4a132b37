"""textgcn_tpu — TPU-native TextGCN/LightGCN embedding-retrieval framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference PyTorch TextGCN (sergey-volokhin/TextGCN, ECIR'23).  The public
registry mirrors reference ``main.py:16-22``.
"""

from .config import Config, get_logger, parse_args
from .registry import get_class

__all__ = ['Config', 'get_class', 'get_logger', 'parse_args',
           'AdvSamplModel', 'LightGCN', 'LTRLinear', 'LTRLinearWPop',
           'Trainer', 'load_interactions', 'load_ltr_data']

__version__ = '0.1.0'


def __getattr__(name):
    """Lazy re-exports of the model/data/train API (keeps `import
    textgcn_tpu` light; mirrors the reference package exports,
    ``TextGCN/__init__.py:1-5``)."""
    lazy = {
        'LightGCN': ('textgcn_tpu.models.lightgcn', 'LightGCN'),
        'AdvSamplModel': ('textgcn_tpu.models.adv_sampling',
                          'AdvSamplModel'),
        'LTRLinear': ('textgcn_tpu.models.ltr', 'LTRLinear'),
        'LTRLinearWPop': ('textgcn_tpu.models.ltr', 'LTRLinearWPop'),
        'Trainer': ('textgcn_tpu.train.trainer', 'Trainer'),
        'load_interactions': ('textgcn_tpu.data.core',
                              'load_interactions'),
        'load_ltr_data': ('textgcn_tpu.data.text', 'load_ltr_data'),
    }
    if name in lazy:
        import importlib
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
