from .incremental import incremental_extract

__all__ = ["incremental_extract"]
