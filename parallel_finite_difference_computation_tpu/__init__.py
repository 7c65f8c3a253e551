"""TPU-native 2D acoustic finite-difference modeling and RTM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``FernandoSchett/parallel_finite_difference_computation`` (see SURVEY.md):
order-2..8+ acoustic wave propagation with absorbing-taper and random
boundaries, Ricker-source forward modeling, and Reverse-Time Migration with
cross-correlation imaging — both the two-snapshot wavefield-reconstruction
variant and the full-wavefield-storage variant — plus shot parallelism and
x-domain decomposition over a TPU device mesh.
"""

from .config import Params, Geometry, parse_input_dat
from .solver import (
    FDContext, forward_modeling, fd_forward, fd_back,
    rtm_shot_snapshot, rtm_shot_full,
)
from . import numerics, io
from .survey import run_survey

__version__ = "0.1.0"
