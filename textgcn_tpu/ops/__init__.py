from . import metrics, propagate, retrieval, sampling

__all__ = ['metrics', 'propagate', 'retrieval', 'sampling']
