"""Velocity-model zoo: loaders for the reference's shipped models and
synthetic generators for testing/benchmarking."""

from .zoo import (
    layered_model, constant_model, load_reference_model, REFERENCE_MODELS,
)
