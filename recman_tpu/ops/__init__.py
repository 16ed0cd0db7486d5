from .embedding import embedding_lookup, fused_grad

__all__ = ["embedding_lookup", "fused_grad"]
