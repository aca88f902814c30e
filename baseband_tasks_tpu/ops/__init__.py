"""Device op library: TPU-tuned kernels shared by tasks and models."""

from .fold import fold_accumulate

__all__ = ["fold_accumulate"]
