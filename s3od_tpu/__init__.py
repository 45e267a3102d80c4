"""s3od_tpu — TPU-native salient-object-detection / background-removal framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the S3OD reference
(`src/s3od/__init__.py:1-4` in the reference): the public API re-exports
`BackgroundRemoval` and `RemovalResult`. Imports are lazy so that lightweight
subpackages (ops, models) can be used without pulling in the full predictor.
"""

__version__ = "0.1.0"
__all__ = ["BackgroundRemoval", "RemovalResult"]


def __getattr__(name):
    if name in ("BackgroundRemoval", "RemovalResult"):
        from s3od_tpu import predictor

        return getattr(predictor, name)
    raise AttributeError(f"module 's3od_tpu' has no attribute {name!r}")
