from . import semantics

__all__ = ["semantics"]
