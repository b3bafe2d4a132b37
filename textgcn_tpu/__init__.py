"""textgcn_tpu — TPU-native TextGCN/LightGCN embedding-retrieval framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference PyTorch TextGCN (sergey-volokhin/TextGCN, ECIR'23).  The public
registry mirrors reference ``main.py:16-22``.
"""

from .config import Config, get_logger, parse_args
from .registry import get_class

__all__ = ['Config', 'get_class', 'get_logger', 'parse_args']

__version__ = '0.1.0'
