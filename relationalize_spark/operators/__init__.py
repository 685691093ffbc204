from .relationalize import relationalize

__all__ = ["relationalize"]
