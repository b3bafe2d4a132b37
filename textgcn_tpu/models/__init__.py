from .lightgcn import LightGCN

__all__ = ['LightGCN']
