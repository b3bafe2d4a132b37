from .core import Graph, InteractionData, load_interactions

__all__ = ['Graph', 'InteractionData', 'load_interactions']
