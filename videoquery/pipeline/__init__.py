"""Extraction pipeline package.

Lazy re-exports (PEP 562): `preprocess` pulls in jax, and the decode
worker processes of the multi-core producer (pipeline/mpstream.py) import
this package on their way to the jax-free `payload`/`decode` modules — an
eager jax import here would multiply every worker's startup by ~10x."""

_LAZY = {
    "frame_ticks": "videoquery.pipeline.sampling",
    "clip_ranges": "videoquery.pipeline.sampling",
    "preprocess_rgb": "videoquery.pipeline.preprocess",
    "preprocess_flow": "videoquery.pipeline.preprocess",
    "BGR_MEAN": "videoquery.pipeline.preprocess",
    "FLOW_MEAN": "videoquery.pipeline.preprocess",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
